"""Morph the fast empty kernel (probe8) toward the slow one (probe9)."""
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
R = 32


def timeit(f, *a, n=4):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a); jax.block_until_ready(out)
    return (time.time() - t0) / n


def build(init_states, read_all, true_4d, smem_gptr_write):
    def kernel(tbl, act, true, stream, inst, o0, o1, o2,
               r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s):
        tb = pl.program_id(1)

        @pl.when(tb == 0)
        def _():
            r0[:] = jnp.zeros(r0.shape, jnp.float32)
            if init_states:
                states_s[:] = inst[0]
            if smem_gptr_write:
                gptr_s[0] = 0

        z = tbl[0, 0, 0] + act[0, 0, 0]
        if true_4d:
            z = z + true[0, 0, 0, 0]
        else:
            z = z + true[0, 0, 0]
        if read_all:
            z = z + stream[0, 0, 0].astype(jnp.int32) + inst[0, 0, 0].astype(jnp.int32)
        for o in (o0, o1, o2):
            o[0, 0, :, 0:R] = jnp.zeros((1, R), jnp.int32) + z

    in_specs = [
        pl.BlockSpec((K, 1, NS), lambda b, t: (t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((K, 1, P), lambda b, t: (t, 0, 0)),
        (pl.BlockSpec((1, K, 1, P), lambda b, t: (b, t, 0, 0)) if true_4d
         else pl.BlockSpec((K, 1, P), lambda b, t: (t, 0, 0))),
        pl.BlockSpec((1, WROWS, 128), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, 1, R), lambda b, t: (b, 0, 0)),
    ]
    args = [jnp.zeros((T_pad, 1, NS), jnp.int32),
            jnp.zeros((T_pad, 1, P), jnp.int32),
            (jnp.zeros((1, T_pad, 1, P), jnp.int32) if true_4d
             else jnp.zeros((T_pad, 1, P), jnp.int32)),
            jnp.zeros((B, WROWS, 128), jnp.uint32),
            jnp.zeros((B, 1, R), jnp.uint32)]
    out_specs = tuple(pl.BlockSpec((1, K, 1, P), lambda b, t: (b, t, 0, 0))
                      for _ in range(3))
    out_shape = tuple(jax.ShapeDtypeStruct((B, T_pad, 1, P), jnp.int32)
                      for _ in range(3))
    scratch = [
        pltpu.VMEM((38, 8, 1024), jnp.float32),
        pltpu.VMEM((38, 24, 1024), jnp.float32),
        pltpu.VMEM((38, 24, 1024), jnp.float32),
        pltpu.VMEM((38, 24, 1024), jnp.float32),
        pltpu.VMEM((432, 1024), jnp.float32),
        pltpu.VMEM((24, 1024), jnp.float32),
        pltpu.VMEM((1, P), jnp.float32),
        pltpu.VMEM((1, R), jnp.uint32),
        pltpu.SMEM((1,), jnp.int32),
    ]
    call = pl.pallas_call(
        kernel, grid=(B, TB), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))
    return jax.jit(lambda *a: call(*a)), args



from imgcomp_cvpr_tpu.coding import pallas_codec as pcodec
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib

pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
pc = pc_lib.ProbClassifier(pc_config, 6)
coder = pcodec.PallasCoder(pc, pc_config)
pt = coder._prep_fns((32, 64, 96), 1)[0](jnp.zeros((1, 32 * 64 * 96), jnp.int8))

f, args = build(init_states=True, read_all=True, true_4d=True,
                smem_gptr_write=True)
dt = timeit(f, *args)
print(f'A zeros-true: {dt * 1e3:.2f} ms ({dt / T * 1e6:.2f} us/step)')
args_g = list(args); args_g[2] = pt
dt = timeit(f, *args_g)
print(f'B gather-true (same f): {dt * 1e3:.2f} ms ({dt / T * 1e6:.2f} us/step)')
dt = timeit(f, *args)
print(f'A2 zeros-true again: {dt * 1e3:.2f} ms ({dt / T * 1e6:.2f} us/step)')

import time as _t
# dispatch-latency diagnosis
o = f(*args); jax.block_until_ready(o)
t0 = _t.time()
outs = [f(*args) for _ in range(10)]
jax.block_until_ready(outs[-1])
print(f'10 pipelined calls: {(_t.time() - t0) * 1e3:.1f} ms total')
t0 = _t.time()
for _ in range(10):
    jax.block_until_ready(f(*args))
print(f'10 blocked calls: {(_t.time() - t0) * 1e3:.1f} ms total')
t0 = _t.time()
for _ in range(10):
    np.asarray(jax.device_put(np.ones((4,), np.float32)) + 1)
print(f'10 tiny RTTs: {(_t.time() - t0) * 1e3:.1f} ms total')
