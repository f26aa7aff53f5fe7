"""Bisect the ~90-130us/grid-iteration fixed cost of the wavefront kernel.

Empty-body kernels with the production spec structure; variants drop or
restructure one spec at a time. All shapes are the Kodak B=1 geometry.
"""
import sys, time
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
kf = 24
lanes = [1024, 1024, 1024, 1024]

def timeit(f, *a, n=8):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    outs = [f(*a) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.time() - t0) / n

def build(table_mode='smem_block', n_outs=3, k_steps=K, big_scratch=True,
          stream_in=True, n_weights=13):
    TBv = -(-T // k_steps)
    T_padv = TBv * k_steps

    def kernel(*refs):
        # order: table, [stream], w..., act, true, outs..., scratch...
        i = 0
        table_ref = refs[i]; i += 1
        stream_ref = None
        if stream_in:
            stream_ref = refs[i]; i += 1
        wrefs = refs[i:i + n_weights]; i += n_weights
        act_ref = refs[i]; i += 1
        true_ref = refs[i]; i += 1
        outs = refs[i:i + n_outs]; i += n_outs
        z = act_ref[0, 0, 0] + true_ref[0, 0, 0, 0]
        if table_mode == 'smem_block':
            z = z + table_ref[0, 0, 0]
        elif table_mode == 'smem_full':
            tb = pl.program_id(1)
            z = z + table_ref[tb * k_steps, 0, 0]
        elif table_mode == 'vmem_block':
            z = z + table_ref[0, 0, 0]
        for w in wrefs:
            z = z + w[0, 0].astype(jnp.int32)
        if stream_ref is not None:
            z = z + stream_ref[0, 0, 0].astype(jnp.int32)
        zz = jnp.zeros((1, R), jnp.int32) + z
        for o in outs:
            o[0, 0, :, 0:R] = zz

    in_specs = []
    args = []
    if table_mode == 'smem_block':
        in_specs.append(pl.BlockSpec((k_steps, 1, NS), lambda b, t: (t, 0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.zeros((T_padv, 1, NS), jnp.int32))
    elif table_mode == 'smem_full':
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.zeros((T_padv, 1, NS), jnp.int32))
    elif table_mode == 'vmem_block':
        in_specs.append(pl.BlockSpec((k_steps, 1, NS), lambda b, t: (t, 0, 0)))
        args.append(jnp.zeros((T_padv, 1, NS), jnp.int32))
    if stream_in:
        in_specs.append(pl.BlockSpec((1, WROWS, 128), lambda b, t: (b, 0, 0)))
        args.append(jnp.zeros((B, WROWS, 128), jnp.uint32))
    for _ in range(n_weights):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(jnp.zeros((8, 128), jnp.float32))
    in_specs.append(pl.BlockSpec((k_steps, 1, P), lambda b, t: (t, 0, 0)))
    args.append(jnp.zeros((T_padv, 1, P), jnp.int32))
    in_specs.append(pl.BlockSpec((1, k_steps, 1, P), lambda b, t: (b, t, 0, 0)))
    args.append(jnp.zeros((B, T_padv, 1, P), jnp.int32))

    out_specs = tuple(pl.BlockSpec((1, k_steps, 1, P),
                                   lambda b, t: (b, t, 0, 0))
                      for _ in range(n_outs))
    out_shape = tuple(jax.ShapeDtypeStruct((B, T_padv, 1, P), jnp.int32)
                      for _ in range(n_outs))
    scratch = []
    if big_scratch:
        scratch = [
            pltpu.VMEM((38, 8, lanes[0]), jnp.float32),
            pltpu.VMEM((38, kf, lanes[1]), jnp.float32),
            pltpu.VMEM((38, kf, lanes[2]), jnp.float32),
            pltpu.VMEM((38, kf, lanes[3]), jnp.float32),
            pltpu.VMEM((432, 1024), jnp.float32),
            pltpu.VMEM((kf, 1024), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, R), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ]
    call = pl.pallas_call(
        kernel, grid=(B, TBv), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))
    return jax.jit(lambda *a: call(*a)), args, TBv

variants = {
    'base': {},
    'table_smem_full': {'table_mode': 'smem_full'},
    'table_vmem_block': {'table_mode': 'vmem_block'},
    'one_out': {'n_outs': 1},
    'no_stream': {'stream_in': False},
    'tiny_scratch': {'big_scratch': False},
    'k32': {'k_steps': 32},
    'few_weights': {'n_weights': 2},
}
names = sys.argv[1].split(',') if len(sys.argv) > 1 else list(variants)
for name in names:
    f, args, TBv = build(**variants[name])
    dt = timeit(f, *args)
    print(f'{name}: {dt * 1e3:.2f} ms ({dt / TBv * 1e6:.1f} us/iter, '
          f'{dt / T * 1e6:.2f} us/step)', flush=True)
