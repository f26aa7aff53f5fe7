"""Probe: does int8 double conv throughput on the v5e MXU in practice?

probe29 closed the Pallas fused-block route (XLA's unrolled conv chain
wins at ~127 TFLOP/s bf16 = 64% peak); the remaining AE-leg lever is
precision. The v5e MXU peak doubles for int8 (394 TOPS). This probe
times realistic quantized residual-tower chains at the bench tower
shape (B,128,192,128):

  (a) bf16 conv chain — the deployed baseline;
  (b) int8 conv chain, int32 accum, per-channel rescale to int8 between
      convs (the honest quantized-inference inner loop);
  (c) int8 conv chain with bf16 rescale/ReLU epilogue (int8 storage,
      bf16 elementwise);
  (d) int4 weights x int8 activations (v5e supports int4 matmul via
      packing? — expect no native support, measures the XLA fallback).

Usage: python dev_probes/_probe31_int8conv.py [B] [n_chain] [n_iter]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NCHAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 14
N_ITER = int(sys.argv[3]) if len(sys.argv) > 3 else 4
H, W, C = 128, 192, 128

rng = np.random.RandomState(0)
flops_conv = B * H * W * 9 * C * C * 2 * NCHAIN
DN = lax.conv_dimension_numbers((B, H, W, C), (3, 3, C, C),
                                ('NHWC', 'HWIO', 'NHWC'))


def timed(name, fn, *args, flops=flops_conv, n=N_ITER):
    out = jax.block_until_ready(fn(*args))
    s = float(jax.device_get(jnp.sum(out.astype(jnp.float32)[0, :1])))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f'{name:44s} {dt * 1e3:8.1f} ms  {flops / dt / 1e12:6.1f} T/s'
          f'  (chk {s:.4e})', flush=True)
    return dt


x_bf = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
w_bf = jnp.asarray(rng.randn(NCHAIN, 3, 3, C, C) * 0.05, jnp.bfloat16)
x_i8 = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)
w_i8 = jnp.asarray(rng.randint(-127, 128, (NCHAIN, 3, 3, C, C)), jnp.int8)
w_i4 = jnp.clip(w_i8, -7, 7).astype(jnp.int4)
# per-channel requant multipliers (bf16) and int bit-shift variant
m_bf = jnp.asarray(rng.rand(NCHAIN, C) * (1 / 1024) + 1 / 4096, jnp.bfloat16)


@jax.jit
def chain_bf16(v, w):
    for i in range(NCHAIN):
        v = lax.conv_general_dilated(v, w[i], (1, 1), 'SAME',
                                     dimension_numbers=DN)
        v = jnp.maximum(v, 0)
    return v


@jax.jit
def chain_i8_rescale_i8(v, w, m):
    for i in range(NCHAIN):
        acc = lax.conv_general_dilated(v, w[i], (1, 1), 'SAME',
                                       dimension_numbers=DN,
                                       preferred_element_type=jnp.int32)
        # per-channel bf16 rescale + ReLU + clip back to int8
        y = acc.astype(jnp.bfloat16) * m[i]
        v = jnp.clip(jnp.round(jnp.maximum(y, 0)), 0, 127).astype(jnp.int8)
    return v


@jax.jit
def chain_i8_shift(v, w):
    for i in range(NCHAIN):
        acc = lax.conv_general_dilated(v, w[i], (1, 1), 'SAME',
                                       dimension_numbers=DN,
                                       preferred_element_type=jnp.int32)
        v = jnp.clip(jnp.maximum(acc >> 10, 0), 0, 127).astype(jnp.int8)
    return v


@jax.jit
def chain_i4w(v, w, m):
    for i in range(NCHAIN):
        acc = lax.conv_general_dilated(v, w[i].astype(jnp.int8), (1, 1),
                                       'SAME', dimension_numbers=DN,
                                       preferred_element_type=jnp.int32)
        y = acc.astype(jnp.bfloat16) * m[i]
        v = jnp.clip(jnp.round(jnp.maximum(y, 0)), 0, 127).astype(jnp.int8)
    return v


print(f'== int8 conv probe ({B},{H},{W},{C}) x{NCHAIN} ==', flush=True)
timed('bf16 conv chain (baseline)', chain_bf16, x_bf, w_bf)
timed('int8 conv, bf16 rescale -> int8', chain_i8_rescale_i8, x_i8, w_i8,
      m_bf)
timed('int8 conv, int shift -> int8', chain_i8_shift, x_i8, w_i8)
try:
    timed('int4 weights x int8 acts', chain_i4w, x_i8, w_i4, m_bf)
except Exception as e:  # noqa: BLE001 - probe: report and continue
    print(f'int4: failed: {type(e).__name__}: {str(e)[:200]}', flush=True)
