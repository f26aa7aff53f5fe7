"""Floor probe 3: the real forward kernel's EXACT specs, empty body."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
weights = coder._weights(pc_params, centers)
pack_true = coder._prep_fns(SHAPE, 1)[0]
true_syms = pack_true(jnp.zeros((1, 32 * 64 * 96), jnp.int8))
wrows = sched.wcap // 128 + 2
streams = jnp.zeros((1, wrows, 128), jnp.uint32)
states = jnp.full((1, 1, pk.R), rans.RANS_L, jnp.uint32)
mode1 = jnp.ones((1,), jnp.int32)

K_STEPS = pk.K_STEPS
T_pad = sched.table.shape[0]
TB = T_pad // K_STEPS
P_pad, NS = sched.P_pad, sched.table.shape[-1]
lanes = sched.lanes
kf = 24
B = 1


def timeit(f, *a, n=5):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a); jax.block_until_ready(out)
    return (time.time() - t0) / n


def kernel(table_ref, mode_ref, pad_ref,
           w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
           w4_ref, b4_ref, k1_ref, k2_ref, k3_ref, centers_ref,
           act_ref, true_ref, stream_ref, inst_ref,
           sym_out, fsel_out, ssel_out,
           r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _init():
        r0[:] = jnp.zeros(r0.shape, jnp.float32) + pad_ref[0]
        r1[:] = jnp.zeros(r1.shape, jnp.float32) + k1_ref[:][:, 0:1]
        r2[:] = jnp.zeros(r2.shape, jnp.float32) + k2_ref[:][:, 0:1]
        r3[:] = jnp.zeros(r3.shape, jnp.float32) + k3_ref[:][:, 0:1]
        states_s[:] = inst_ref[0]
        gptr_s[0] = 0

    z = (table_ref[0, 0, 0] + mode_ref[0]
         + act_ref[0, 0, 0] + true_ref[0, 0, 0, 0]
         + stream_ref[0, 0, 0].astype(jnp.int32))
    zz = jnp.zeros((1, pk.R), jnp.int32) + z
    sym_out[0, 0, :, 0:pk.R] = zz
    fsel_out[0, 0, :, 0:pk.R] = zz.astype(jnp.uint32)
    ssel_out[0, 0, :, 0:pk.R] = zz.astype(jnp.uint32)


in_specs = [
    pl.BlockSpec((K_STEPS, 1, NS), lambda b, t: (t, 0, 0),
                 memory_space=pltpu.SMEM),
    pl.BlockSpec(memory_space=pltpu.SMEM),
    pl.BlockSpec(memory_space=pltpu.SMEM),
] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12 + [
    pl.BlockSpec((K_STEPS, 1, P_pad), lambda b, t: (t, 0, 0)),
    pl.BlockSpec((1, K_STEPS, 1, P_pad), lambda b, t: (b, t, 0, 0)),
    pl.BlockSpec((1, wrows, 128), lambda b, t: (b, 0, 0)),
    pl.BlockSpec((1, 1, pk.R), lambda b, t: (b, 0, 0)),
]
out_specs = tuple(pl.BlockSpec((1, K_STEPS, 1, P_pad), lambda b, t: (b, t, 0, 0))
                  for _ in range(3))
out_shape = (jax.ShapeDtypeStruct((B, T_pad, 1, P_pad), jnp.int32),
             jax.ShapeDtypeStruct((B, T_pad, 1, P_pad), jnp.uint32),
             jax.ShapeDtypeStruct((B, T_pad, 1, P_pad), jnp.uint32))
scratch = [
    pltpu.VMEM((pk.VR, pk.Q_CH, lanes[0]), jnp.float32),
    pltpu.VMEM((pk.VR, kf, lanes[1]), jnp.float32),
    pltpu.VMEM((pk.VR, kf, lanes[2]), jnp.float32),
    pltpu.VMEM((pk.VR, kf, lanes[3]), jnp.float32),
    pltpu.VMEM((18 * kf, max(lanes[1], P_pad)), jnp.float32),
    pltpu.VMEM((kf, lanes[1]), jnp.float32),
    pltpu.VMEM((1, P_pad), jnp.float32),
    pltpu.VMEM((1, pk.R), jnp.uint32),
    pltpu.SMEM((1,), jnp.int32),
]

call = pl.pallas_call(kernel, grid=(B, TB), in_specs=in_specs,
                      out_specs=out_specs, out_shape=out_shape,
                      scratch_shapes=scratch,
                      compiler_params=pltpu.CompilerParams(
                          dimension_semantics=('arbitrary', 'arbitrary')))
f = jax.jit(lambda w, tb_, ts, st, ins, m: call(
    tb_[0], m, w[0], w[1], w[2], w[3], w[4], w[5], w[6], w[7], w[8],
    w[9], w[10], w[11], w[12], tb_[1], ts, st, ins))
dt = timeit(f, weights, tables, true_syms, streams, states, mode1)
print(f'exact-spec empty: {dt * 1e3:.1f} ms ({dt / sched.T * 1e6:.2f} us/step)')
