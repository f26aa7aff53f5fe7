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


for name, kw in [
    ('base (probe8-like)', dict(init_states=False, read_all=True,
                                true_4d=False, smem_gptr_write=False)),
    ('+init states', dict(init_states=True, read_all=True, true_4d=False,
                          smem_gptr_write=False)),
    ('+gptr write', dict(init_states=True, read_all=True, true_4d=False,
                         smem_gptr_write=True)),
    ('+true 4d', dict(init_states=True, read_all=True, true_4d=True,
                      smem_gptr_write=True)),
]:
    try:
        f, args = build(**kw)
        dt = timeit(f, *args)
        print(f'{name}: {dt * 1e3:.2f} ms ({dt / T * 1e6:.2f} us/step)')
    except Exception as e:
        print(f'{name}: {type(e).__name__} ' + str(e).replace(chr(10), ' ')[:130])

# --- same process: probe9's exact setup (real schedule constants) ---
from imgcomp_cvpr_tpu.coding import pallas_kernel as pk
from imgcomp_cvpr_tpu.coding import pallas_codec as pcodec
from imgcomp_cvpr_tpu.coding import rans
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib

SHAPE = (32, 64, 96)
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
pc = pc_lib.ProbClassifier(pc_config, 6)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers = np.linspace(-2, 2, 6).astype(np.float32)
coder = pcodec.PallasCoder(pc, pc_config)
tables, sched = coder._tables(SHAPE)
f, args = build(init_states=True, read_all=True, true_4d=True,
                smem_gptr_write=True)
# swap in the REAL table/active device arrays (same shapes)
args2 = [tables[0], tables[1]] + args[2:]
dt = timeit(f, *args2)
print(f'real-constants: {dt * 1e3:.2f} ms ({dt / T * 1e6:.2f} us/step)')

# and the REAL kernel in 'empty' ablation, same process
pk._ABLATE = 'empty'
pk.make_forward.cache_clear()
fwd, _ = pk.make_forward(SHAPE, 24, 6, 1)
weights = coder._weights(pc_params, centers)
true_syms = coder._prep_fns(SHAPE, 1)[0](jnp.zeros((1, 32 * 64 * 96), jnp.int8))
wrows = sched.wcap // 128 + 2
streams = jnp.zeros((1, wrows, 128), jnp.uint32)
states = jnp.full((1, 1, pk.R), rans.RANS_L, jnp.uint32)
ff = jax.jit(fwd)
dt = timeit(ff, weights, tables, true_syms, streams, states,
            jnp.ones((1,), jnp.int32))
print(f'real-kernel-empty: {dt * 1e3:.2f} ms ({dt / T * 1e6:.2f} us/step)')

# --- u32 outputs variant ---
def build_u32():
    def kernel(tbl, act, true, stream, inst, o0, o1, o2,
               r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s):
        tb = pl.program_id(1)

        @pl.when(tb == 0)
        def _():
            r0[:] = jnp.zeros(r0.shape, jnp.float32)
            states_s[:] = inst[0]
            gptr_s[0] = 0

        z = (tbl[0, 0, 0] + act[0, 0, 0] + true[0, 0, 0, 0]
             + stream[0, 0, 0].astype(jnp.int32))
        zz = jnp.zeros((1, R), jnp.int32) + z
        o0[0, 0, :, 0:R] = zz
        o1[0, 0, :, 0:R] = zz.astype(jnp.uint32)
        o2[0, 0, :, 0:R] = zz.astype(jnp.uint32)

    in_specs = [
        pl.BlockSpec((K, 1, NS), lambda b, t: (t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((K, 1, P), lambda b, t: (t, 0, 0)),
        pl.BlockSpec((1, K, 1, P), lambda b, t: (b, t, 0, 0)),
        pl.BlockSpec((1, WROWS, 128), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, 1, R), lambda b, t: (b, 0, 0)),
    ]
    args = [jnp.zeros((T_pad, 1, NS), jnp.int32),
            jnp.zeros((T_pad, 1, P), jnp.int32),
            jnp.zeros((1, T_pad, 1, P), jnp.int32),
            jnp.zeros((B, WROWS, 128), jnp.uint32),
            jnp.zeros((B, 1, R), jnp.uint32)]
    out_specs = tuple(pl.BlockSpec((1, K, 1, P), lambda b, t: (b, t, 0, 0))
                      for _ in range(3))
    out_shape = (jax.ShapeDtypeStruct((B, T_pad, 1, P), jnp.int32),
                 jax.ShapeDtypeStruct((B, T_pad, 1, P), jnp.uint32),
                 jax.ShapeDtypeStruct((B, T_pad, 1, P), jnp.uint32))
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

f, args = build_u32()
dt = timeit(f, *args)
print(f'u32-outs: {dt * 1e3:.2f} ms ({dt / T * 1e6:.2f} us/step)')

# --- pass the pack_true gather OUTPUT as `true` (layout suspicion) ---
f, args = build(init_states=True, read_all=True, true_4d=True,
                smem_gptr_write=True)
pt = coder._prep_fns(SHAPE, 1)[0](jnp.zeros((1, 32 * 64 * 96), jnp.int8))
print('pack_true out:', pt.shape, pt.dtype)
args3 = [tables[0], tables[1], pt, args[3], args[4]]
dt = timeit(f, *args3)
print(f'gather-true: {dt * 1e3:.2f} ms ({dt / T * 1e6:.2f} us/step)')
