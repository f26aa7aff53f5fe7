"""Floor probe 2: same streams + the codec kernel's scratch/init/resident."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, P, NS, B = 1186, 8, 768, 91, 1
TB = -(-T // K)
T_pad = TB * K
WROWS = 1539


def timeit(f, *a, n=5):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a); jax.block_until_ready(out)
    return (time.time() - t0) / n


def build(with_scratch, with_init, with_resident, init_each=False):
    def kernel(*refs):
        tbl, act, true = refs[0], refs[1], refs[2]
        i = 3
        if with_resident:
            stream, inst = refs[i], refs[i + 1]
            i += 2
        outs = refs[i:i + 3]
        i += 3
        scr = refs[i:]
        tb = pl.program_id(1)
        z = tbl[0, 0, 0] + act[0, 0, 0] + true[0, 0, 0]
        if with_resident:
            z = z + stream[0, 0, 0].astype(jnp.int32) + inst[0, 0, 0].astype(jnp.int32)

        if with_scratch and with_init:
            @pl.when((tb == 0) | jnp.bool_(init_each))
            def _():
                for s in scr[:5]:
                    s[:] = jnp.zeros(s.shape, jnp.float32)

        for o in outs:
            o[0, 0, :, 0:128] = jnp.zeros((1, 128), jnp.int32) + z

    in_specs = [
        pl.BlockSpec((K, 1, NS), lambda b, t: (t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((K, 1, P), lambda b, t: (t, 0, 0)),
        pl.BlockSpec((K, 1, P), lambda b, t: (t, 0, 0)),
    ]
    args = [jnp.zeros((T_pad, 1, NS), jnp.int32),
            jnp.zeros((T_pad, 1, P), jnp.int32),
            jnp.zeros((T_pad, 1, P), jnp.int32)]
    if with_resident:
        in_specs += [pl.BlockSpec((1, WROWS, 128), lambda b, t: (b, 0, 0)),
                     pl.BlockSpec((1, 1, 32), lambda b, t: (b, 0, 0))]
        args += [jnp.zeros((B, WROWS, 128), jnp.uint32),
                 jnp.zeros((B, 1, 32), jnp.uint32)]
    out_specs = tuple(pl.BlockSpec((1, K, 1, P), lambda b, t: (b, t, 0, 0))
                      for _ in range(3))
    out_shape = tuple(jax.ShapeDtypeStruct((B, T_pad, 1, P), jnp.int32)
                      for _ in range(3))
    scratch = []
    if with_scratch:
        scratch = [
            pltpu.VMEM((38, 8, 1024), jnp.float32),
            pltpu.VMEM((38, 24, 1024), jnp.float32),
            pltpu.VMEM((38, 24, 1024), jnp.float32),
            pltpu.VMEM((38, 24, 1024), jnp.float32),
            pltpu.VMEM((432, 1024), jnp.float32),
            pltpu.VMEM((24, 1024), jnp.float32),
            pltpu.VMEM((1, 768), jnp.float32),
            pltpu.VMEM((1, 32), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ]
    call = pl.pallas_call(
        kernel, grid=(B, TB), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))
    return jax.jit(lambda *a: call(*a)), args


for name, ws, wi, wr in [
    ('scratch, no init, no resident', True, False, False),
    ('scratch + init, no resident', True, True, False),
    ('scratch + init + resident', True, True, True),
    ('no scratch + resident', False, False, True),
]:
    try:
        f, args = build(ws, wi, wr)
        dt = timeit(f, *args)
        print(f'{name}: {dt * 1e3:.1f} ms ({dt / T * 1e6:.2f} us/step)')
    except Exception as e:
        print(f'{name}: {type(e).__name__} ' + str(e).replace(chr(10), ' ')[:140])
