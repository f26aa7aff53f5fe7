"""Probe: can a Pallas fused residual block beat XLA's spatial convs?

probe27 found the AE tower convs run at ~106 TFLOP/s (bf16, 54% of the
v5e MXU peak) with a ~3.2 ms/conv floor visible even at 1x1 (1/9 FLOPs),
i.e. the towers are per-conv-overhead-bound, not FLOP- or HBM-bound.
This probe times:
  (a) the XLA residual block (conv-bn-relu-conv-bn-add) as deployed,
      fori_loop vs unrolled chains (does the loop cost anything?);
  (b) a true matmul roofline: unrolled (M,128)@(128,128) chain;
  (c) a Pallas fused-block kernel: one grid step computes a whole
      residual block on a row tile held in VMEM — conv1 as 9 shifted
      (rows*W, C)@(C, C) MXU dots + affine(BN) + ReLU, conv2 likewise,
      + skip — reading x from HBM once and writing the block output
      once. H halo 2 per conv (slab = HS+4 rows, zero SAME pad via a
      pre-padded input); W SAME pad via zero-fill shifted slices.

Usage: python dev_probes/_probe29_fusedblock.py [B] [HS] [n_blocks]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

if os.environ.get('IMGCOMP_PROBE_CPU'):   # sitecustomize overrides env vars
    jax.config.update('jax_platforms', 'cpu')
os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
HS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
NBLK = int(sys.argv[3]) if len(sys.argv) > 3 else 7
H, W, C = 128, 192, 128
INTERP = jax.default_backend() != 'tpu'

rng = np.random.RandomState(0)
flops_block = B * H * W * 9 * C * C * 2 * 2 * NBLK  # 2 convs per block


def timed(name, fn, *args, flops=flops_block, n=4):
    out = jax.block_until_ready(fn(*args))
    chk = float(jax.device_get(jnp.sum(out.astype(jnp.float32)[0, :1])))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f'{name:40s} {dt * 1e3:8.1f} ms  {flops / dt / 1e12:6.1f} TFLOP/s'
          f'  (chk {chk:.4e})', flush=True)
    return dt, out


x32 = rng.rand(B, H, W, C).astype(np.float32)
w1_np = ((rng.rand(3, 3, C, C) - 0.5) * 0.05).astype(np.float32)
w2_np = ((rng.rand(3, 3, C, C) - 0.5) * 0.05).astype(np.float32)
s1_np = (0.9 + 0.2 * rng.rand(C)).astype(np.float32)
b1_np = (0.1 * rng.rand(C)).astype(np.float32)
s2_np = (0.9 + 0.2 * rng.rand(C)).astype(np.float32)
b2_np = (0.1 * rng.rand(C)).astype(np.float32)

x16 = jnp.asarray(x32).astype(jnp.bfloat16)
w1, w2 = jnp.asarray(w1_np, jnp.bfloat16), jnp.asarray(w2_np, jnp.bfloat16)
s1, b1 = jnp.asarray(s1_np), jnp.asarray(b1_np)
s2, b2 = jnp.asarray(s2_np), jnp.asarray(b2_np)


def conv(v, w):
    return lax.conv_general_dilated(
        v, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def xla_block(v, w1, w2):
    y = conv(v, w1)
    y = (y.astype(jnp.float32) * s1 + b1).astype(v.dtype)
    y = jax.nn.relu(y)
    y = conv(y, w2)
    y = (y.astype(jnp.float32) * s2 + b2).astype(v.dtype)
    return y + v


@jax.jit
def xla_chain_fori(v, w1, w2):
    return lax.fori_loop(0, NBLK, lambda i, u: xla_block(u, w1, w2), v)


@jax.jit
def xla_chain_unroll(v, w1, w2):
    for _ in range(NBLK):
        v = xla_block(v, w1, w2)
    return v


M = B * H * W
xm = x16.reshape(M, C)


@jax.jit
def matmul_chain_unroll(v, w):
    wf = w.reshape(9, C, C)
    for i in range(9 * NBLK * 2):
        v = jax.lax.dot(v, wf[i % 9],
                        preferred_element_type=jnp.bfloat16)
    return v


# ---------------------------------------------------------------- pallas
NT = H // HS                    # row tiles per image
SLAB = HS + 4                   # input rows incl. conv1+conv2 halo


def _conv9(slab, w9, rows):
    """9-dot conv on a VMEM slab: slab (rows+2, W, C) -> (rows, W, C) f32.
    w9: (9, C, C). W SAME pad via zero-filled shifted slices."""
    acc = jnp.zeros((rows * W, C), jnp.float32)
    for dy in range(3):
        a = slab[dy:dy + rows]                       # (rows, W, C)
        za = jnp.zeros((rows, 1, C), a.dtype)
        for dx in range(3):
            if dx == 0:
                sh = jnp.concatenate([za, a[:, :-1]], axis=1)
            elif dx == 2:
                sh = jnp.concatenate([a[:, 1:], za], axis=1)
            else:
                sh = a
            acc = acc + jax.lax.dot(
                sh.reshape(rows * W, C), w9[dy * 3 + dx],
                preferred_element_type=jnp.float32)
    return acc.reshape(rows, W, C)


def _block_kernel(xpad_hbm, w1_ref, w2_ref, aff_ref, out_ref, slab_ref,
                  sem):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    cp = pltpu.make_async_copy(
        xpad_hbm.at[bi, pl.ds(ti * HS, SLAB)], slab_ref, sem)
    cp.start()
    cp.wait()
    slab = slab_ref[...]
    y = _conv9(slab, w1_ref[...], HS + 2)            # (HS+2, W, C) f32
    y = y * aff_ref[0, 0] + aff_ref[1, 0]
    # conv2's SAME pad must see ZEROS outside the image; y rows here span
    # absolute rows [ti*HS - 1, ti*HS + HS], so the first row of the top
    # tile and the last row of the bottom tile are phantoms — mask them.
    arow = (jax.lax.broadcasted_iota(jnp.int32, (HS + 2, W, C), 0)
            + ti * HS - 1)                # 3D iota: Mosaic can't reshape i1
    y = jnp.where((arow >= 0) & (arow < H), y, 0.0)
    y = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
    z = _conv9(y, w2_ref[...], HS)                   # (HS, W, C) f32
    z = z * aff_ref[2, 0] + aff_ref[3, 0]
    out_ref[0] = (z + slab[2:2 + HS].astype(jnp.float32)).astype(
        jnp.bfloat16)


@jax.jit
def pallas_chain(v, w1, w2):
    w1r = w1.reshape(9, C, C)
    w2r = w2.reshape(9, C, C)
    aff = jnp.stack([s1, b1, s2, b2])[:, None, :]    # (4, 1, C) f32
    kern = pl.pallas_call(
        _block_kernel,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((9, C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((4, 1, C), lambda b, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, HS, W, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((SLAB, W, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
        interpret=INTERP,
    )
    for _ in range(NBLK):
        vp = jnp.pad(v, ((0, 0), (2, 2), (0, 0), (0, 0)))
        v = kern(vp, w1r, w2r, aff)
    return v


# ------------------------------------------------------------- pallas v2
# Fixes over v1 (which lost to XLA 67.5 vs 51.4 ms):
#  - padded in/out buffers live across the whole chain (borders written
#    once by a border grid step, never re-padded in XLA = no extra
#    805 MB/block HBM round trip);
#  - input DMA double-buffered (tile t+1 streams in while t computes);
#  - conv as 3 dx-dots of K=3C=384 on a dy-concatenated VMEM slab
#    (deeper contraction per MXU pass than 9 K=128 dots).


def _conv3(xc, w3):
    """xc: (rows, W, 3*cin) dy-concatenated slab (dy already folded into
    channels); w3: (3, 3*cin, C) per-dx weights -> (rows*W, C) f32.
    dx shifts via zero-filled W slices (SAME zero pad)."""
    rows, _, k = xc.shape
    m = rows * W
    z = jnp.zeros((rows, 1, k), xc.dtype)
    acc = jax.lax.dot(xc.reshape(m, k), w3[1],
                      preferred_element_type=jnp.float32)
    sh = jnp.concatenate([z, xc[:, :-1]], axis=1)
    acc = acc + jax.lax.dot(sh.reshape(m, k), w3[0],
                            preferred_element_type=jnp.float32)
    sh = jnp.concatenate([xc[:, 1:], z], axis=1)
    acc = acc + jax.lax.dot(sh.reshape(m, k), w3[2],
                            preferred_element_type=jnp.float32)
    return acc


def _dycat(v, out_rows):
    """(out_rows+2, W, C) -> (out_rows, W, 3C): row r carries the channels
    of input rows r, r+1, r+2 (output row r is centered on input r+1)."""
    return jnp.concatenate(
        [v[0:out_rows], v[1:out_rows + 1], v[2:out_rows + 2]], axis=2)


def _block_kernel_v2(xpad_hbm, w1_ref, w2_ref, aff_ref, out_hbm,
                     slab_ref, y_ref, obuf_ref, sem_in, sem_out, sem_z):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    nt = pl.num_programs(1)
    first = jnp.logical_and(bi == 0, ti == 0)

    def start_in(b, t, slot):
        return pltpu.make_async_copy(
            xpad_hbm.at[b, pl.ds(t * HS, SLAB)], slab_ref.at[slot],
            sem_in.at[slot])

    @pl.when(first)
    def _prologue():
        start_in(0, 0, 0).start()
        # borders: rows [0,2) and [H+2,H+4) of every image's padded output
        # are zeros; write them once from a zeroed scratch row pair.
        obuf_ref[1, 0:2] = jnp.zeros((2, W, C), jnp.bfloat16)

    # borders of image bi (top+bottom), issued once per image at ti == 0
    @pl.when(ti == 0)
    def _borders():
        top = pltpu.make_async_copy(
            obuf_ref.at[1, 0:2], out_hbm.at[bi, pl.ds(0, 2)], sem_z.at[0])
        bot = pltpu.make_async_copy(
            obuf_ref.at[1, 0:2], out_hbm.at[bi, pl.ds(H + 2, 2)],
            sem_z.at[1])
        top.start()
        bot.start()
        top.wait()
        bot.wait()

    slot = ti % 2
    # next tile's DMA starts before this tile computes
    nb = jnp.where(ti + 1 < nt, bi, bi + 1)
    ntile = jnp.where(ti + 1 < nt, ti + 1, 0)

    @pl.when(nb < pl.num_programs(0))
    def _prefetch():
        start_in(nb, ntile, 1 - slot).start()

    start_in(bi, ti, slot).wait()
    slab = slab_ref[slot]
    y = _conv3(_dycat(slab, HS + 2), w1_ref[...])
    y = y.reshape(HS + 2, W, C) * aff_ref[0, 0] + aff_ref[1, 0]
    arow = (jax.lax.broadcasted_iota(jnp.int32, (HS + 2, W, C), 0)
            + ti * HS - 1)
    y = jnp.where((arow >= 0) & (arow < H), y, 0.0)
    y_ref[...] = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
    z = _conv3(_dycat(y_ref[...], HS), w2_ref[...])
    z = z.reshape(HS, W, C) * aff_ref[2, 0] + aff_ref[3, 0]
    # previous tile's output DMA must have drained before we overwrite
    @pl.when(jnp.logical_not(first))
    def _wait_prev_out():
        pltpu.make_async_copy(obuf_ref.at[0], obuf_ref.at[0],
                              sem_out).wait()

    obuf_ref[0] = (z + slab[2:2 + HS].astype(jnp.float32)).astype(
        jnp.bfloat16)
    out = pltpu.make_async_copy(
        obuf_ref.at[0], out_hbm.at[bi, pl.ds(2 + ti * HS, HS)], sem_out)
    out.start()
    last = jnp.logical_and(bi == pl.num_programs(0) - 1, ti == nt - 1)

    @pl.when(last)
    def _drain():
        out.wait()


@jax.jit
def pallas_chain_v2(v, w1, w2):
    # per-dx (3C, C) weights: w[dy, dx] stacked over dy along the input dim
    w1r = jnp.transpose(w1, (1, 0, 2, 3)).reshape(3, 3 * C, C)
    w2r = jnp.transpose(w2, (1, 0, 2, 3)).reshape(3, 3 * C, C)
    aff = jnp.stack([s1, b1, s2, b2])[:, None, :]
    kern = pl.pallas_call(
        _block_kernel_v2,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3 * C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((3, 3 * C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((4, 1, C), lambda b, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H + 4, W, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((2, SLAB, W, C), jnp.bfloat16),
                        pltpu.VMEM((HS + 2, W, C), jnp.bfloat16),
                        pltpu.VMEM((2, HS, W, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=INTERP,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )
    vp = jnp.pad(v, ((0, 0), (2, 2), (0, 0), (0, 0)))   # once per chain
    for _ in range(NBLK):
        vp = kern(vp, w1r, w2r, aff)
    return vp[:, 2:2 + H]


# ------------------------------------------------------------- pallas v3
# K=1152 single-dot im2col: materialize the (rows*W, 9C) im2col matrix in
# VMEM (dy via _dycat channels, dx via three zero-filled W shifts of the
# dy-cat slab, concatenated along channels), then ONE MXU dot per conv
# with contraction depth 9C = 1152. Deeper contraction per pass than
# v2's 3 dots of K=384; costs an extra VMEM copy of 3x the slab.


def _im2col(xc, rows):
    """xc: (rows, W, 3*cin) dy-cat slab -> (rows*W, 9*cin) with dx in
    [-1, 0, 1] concatenated along channels (zero SAME pad in W)."""
    z = jnp.zeros((rows, 1, xc.shape[2]), xc.dtype)
    left = jnp.concatenate([z, xc[:, :-1]], axis=1)
    right = jnp.concatenate([xc[:, 1:], z], axis=1)
    return jnp.concatenate([left, xc, right], axis=2).reshape(
        rows * W, 3 * xc.shape[2])


def _block_kernel_v3(xpad_hbm, w1_ref, w2_ref, aff_ref, out_hbm,
                     slab_ref, y_ref, obuf_ref, sem_in, sem_out, sem_z):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    nt = pl.num_programs(1)
    first = jnp.logical_and(bi == 0, ti == 0)

    def start_in(b, t, slot):
        return pltpu.make_async_copy(
            xpad_hbm.at[b, pl.ds(t * HS, SLAB)], slab_ref.at[slot],
            sem_in.at[slot])

    @pl.when(first)
    def _prologue():
        start_in(0, 0, 0).start()
        obuf_ref[1, 0:2] = jnp.zeros((2, W, C), jnp.bfloat16)

    @pl.when(ti == 0)
    def _borders():
        top = pltpu.make_async_copy(
            obuf_ref.at[1, 0:2], out_hbm.at[bi, pl.ds(0, 2)], sem_z.at[0])
        bot = pltpu.make_async_copy(
            obuf_ref.at[1, 0:2], out_hbm.at[bi, pl.ds(H + 2, 2)],
            sem_z.at[1])
        top.start()
        bot.start()
        top.wait()
        bot.wait()

    slot = ti % 2
    nb = jnp.where(ti + 1 < nt, bi, bi + 1)
    ntile = jnp.where(ti + 1 < nt, ti + 1, 0)

    @pl.when(nb < pl.num_programs(0))
    def _prefetch():
        start_in(nb, ntile, 1 - slot).start()

    start_in(bi, ti, slot).wait()
    slab = slab_ref[slot]
    y = jax.lax.dot(_im2col(_dycat(slab, HS + 2), HS + 2), w1_ref[...],
                    preferred_element_type=jnp.float32)
    y = y.reshape(HS + 2, W, C) * aff_ref[0, 0] + aff_ref[1, 0]
    arow = (jax.lax.broadcasted_iota(jnp.int32, (HS + 2, W, C), 0)
            + ti * HS - 1)
    y = jnp.where((arow >= 0) & (arow < H), y, 0.0)
    y_ref[...] = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
    z = jax.lax.dot(_im2col(_dycat(y_ref[...], HS), HS), w2_ref[...],
                    preferred_element_type=jnp.float32)
    z = z.reshape(HS, W, C) * aff_ref[2, 0] + aff_ref[3, 0]

    @pl.when(jnp.logical_not(first))
    def _wait_prev_out():
        pltpu.make_async_copy(obuf_ref.at[0], obuf_ref.at[0],
                              sem_out).wait()

    obuf_ref[0] = (z + slab[2:2 + HS].astype(jnp.float32)).astype(
        jnp.bfloat16)
    out = pltpu.make_async_copy(
        obuf_ref.at[0], out_hbm.at[bi, pl.ds(2 + ti * HS, HS)], sem_out)
    out.start()
    last = jnp.logical_and(bi == pl.num_programs(0) - 1, ti == nt - 1)

    @pl.when(last)
    def _drain():
        out.wait()


@jax.jit
def pallas_chain_v3(v, w1, w2):
    # _im2col channel order: dx-major over a dy-cat slab: [dx=-1 | dx=0 |
    # dx=+1], each (dy0,dy1,dy2)-cat channels. w[dy, dx, cin, cout] must
    # be ordered (dx, dy, cin): transpose first.
    w1r = jnp.transpose(w1, (1, 0, 2, 3)).reshape(9 * C, C)
    w2r = jnp.transpose(w2, (1, 0, 2, 3)).reshape(9 * C, C)
    aff = jnp.stack([s1, b1, s2, b2])[:, None, :]
    kern = pl.pallas_call(
        _block_kernel_v3,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((9 * C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((4, 1, C), lambda b, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H + 4, W, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((2, SLAB, W, C), jnp.bfloat16),
                        pltpu.VMEM((HS + 2, W, C), jnp.bfloat16),
                        pltpu.VMEM((2, HS, W, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=INTERP,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )
    vp = jnp.pad(v, ((0, 0), (2, 2), (0, 0), (0, 0)))
    for _ in range(NBLK):
        vp = kern(vp, w1r, w2r, aff)
    return vp[:, 2:2 + H]


print(f'== B={B} fused-block probe ({B},{H},{W},{C}) HS={HS} '
      f'x{NBLK}-blocks ==', flush=True)

timed('matmul roofline unrolled (M,128)@(128,128)', matmul_chain_unroll,
      xm, w1)
_, ref_out = timed('XLA block chain fori_loop', xla_chain_fori, x16, w1, w2)
timed('XLA block chain unrolled', xla_chain_unroll, x16, w1, w2)
_, pl_out = timed('PALLAS fused block chain v1', pallas_chain, x16, w1, w2)
_, pl2_out = timed('PALLAS fused block chain v2', pallas_chain_v2,
                   x16, w1, w2)
_, pl3_out = timed('PALLAS fused block chain v3 (K=1152)', pallas_chain_v3,
                   x16, w1, w2)


def report(name, out):
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref_out.astype(jnp.float32))))
    ref_mag = float(jnp.max(jnp.abs(ref_out.astype(jnp.float32))))
    print(f'{name}-vs-XLA max abs err {err:.4e} '
          f'(ref magnitude {ref_mag:.2f})', flush=True)


report('pallas-v1', pl_out)
report('pallas-v2', pl2_out)
report('pallas-v3', pl3_out)
