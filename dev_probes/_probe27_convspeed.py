"""Probe: where does the AE tower's ~3x-above-roofline conv time go?

probe26 showed BN folding is neutral (XLA fuses elementwise already), so
the gap lives in the convolutions. This probe times a bare chain of
3x3 128->128 convs at the tower activation shape (64,128,192,128)
against (a) an equal-FLOP matmul chain (the MXU roofline in practice),
(b) layout variants (NCHW), (c) an im2col/matmul formulation, and
(d) channel-width variants, all inside single jits with the chain
length amortizing dispatch overhead.

Usage: python dev_probes/_probe27_convspeed.py [B] [n_chain] [n_iter]
"""
import os
import sys
import time
from functools import partial

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


def timed(name, fn, *args, flops=flops_conv, n=N_ITER):
    out = jax.block_until_ready(fn(*args))
    s = float(jax.device_get(jnp.sum(out.astype(jnp.float32)[0, :1])))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f'{name:44s} {dt * 1e3:8.1f} ms  {flops / dt / 1e12:6.1f} TFLOP/s'
          f'  (chk {s:.3e})', flush=True)
    return dt


x32 = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
w32 = jnp.asarray((rng.rand(3, 3, C, C).astype(np.float32) - 0.5) * 0.05)
x16, w16 = x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)


def chain(x, w, nch, conv):
    def body(i, v):
        return conv(v, w)
    return lax.fori_loop(0, nch, body, x)


def conv_nhwc(v, w):
    return lax.conv_general_dilated(
        v, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv_nchw(v, w):
    return lax.conv_general_dilated(
        v, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))


def conv_im2col(v, w):
    # 9 shifted (BHW, C) x (C, C) matmuls accumulated — pure MXU form.
    pad = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros(v.shape, v.dtype)
    for dy in range(3):
        for dx in range(3):
            sl = pad[:, dy:dy + H, dx:dx + W, :]
            acc = acc + jnp.einsum('bhwc,cd->bhwd', sl, w[dy, dx],
                                   preferred_element_type=v.dtype)
    return acc


print(f'== B={B} conv probe ({B},{H},{W},{C}) x{NCHAIN}-chain ==', flush=True)

# roofline: equal-FLOP matmul chain (keeps one (M,128)x(128,128) resident)
M = B * H * W
xm = x16.reshape(M, C)
wm9 = [w16[i // 3, i % 3] for i in range(9)]


@jax.jit
def matmul_chain(xm, ws):
    def body(i, v):
        def inner(j, u):
            wsel = lax.switch(j, [lambda w=w: w for w in ws])
            return (u @ wsel).astype(u.dtype)
        return lax.fori_loop(0, 9, inner, v)
    return lax.fori_loop(0, NCHAIN, body, xm)


timed('matmul roofline bf16 (BHW,128)@(128,128)x9', matmul_chain, xm,
      tuple(wm9))

timed('conv NHWC bf16', jax.jit(partial(chain, nch=NCHAIN, conv=conv_nhwc)),
      x16, w16)
timed('conv NHWC f32in', jax.jit(partial(chain, nch=NCHAIN, conv=conv_nhwc)),
      x32, w32)

xc16 = jnp.transpose(x16, (0, 3, 1, 2))
wc16 = jnp.transpose(w16, (3, 2, 0, 1))
timed('conv NCHW bf16', jax.jit(partial(chain, nch=NCHAIN, conv=conv_nchw)),
      xc16, wc16)

timed('conv im2col-einsum bf16',
      jax.jit(partial(chain, nch=NCHAIN, conv=conv_im2col)), x16, w16)

# channel-width scan: is 128 ch per conv too thin for the MXU pipeline?
for cc, hh, ww in ((256, 64, 192), (512, 32, 192)):
    xv = jnp.asarray(rng.rand(B, hh, ww, cc).astype(np.float32)).astype(
        jnp.bfloat16)
    wv = jnp.asarray((rng.rand(3, 3, cc, cc).astype(np.float32) - 0.5)
                     * 0.05).astype(jnp.bfloat16)
    fl = B * hh * ww * 9 * cc * cc * 2 * NCHAIN
    timed(f'conv NHWC bf16 C={cc} ({hh}x{ww})',
          jax.jit(partial(chain, nch=NCHAIN, conv=conv_nhwc)), xv, wv,
          flops=fl)

# 1x1 conv: isolates per-conv fixed cost from the 3x3 window handling
w1 = w16[1:2, 1:2]


def conv1x1(v, w):
    return lax.conv_general_dilated(
        v, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


timed('conv 1x1 NHWC bf16 (1/9 FLOPs)',
      jax.jit(partial(chain, nch=NCHAIN, conv=conv1x1)), x16, w1,
      flops=flops_conv // 9)
