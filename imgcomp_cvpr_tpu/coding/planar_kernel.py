"""Per-plane 2D wavefront Pallas kernel for general kernel_size.

One invocation codes ONE symbol depth-plane (all of its T2 wavefront
steps) for a batch of images; coding/planar_codec.py scans it over depth
with XLA bias convs between planes (see coding/planar.py for the design
and the ring algebra). Per step, each layer is: ~K*K/2 static-shift tap
rolls from a VR-slot ring, one MXU dot, plus the streamed bias row; the
step's symbol band is ONE interleaved-rANS chunk (R lanes). Encode
(teacher-forced) and decode share the executable (traced mode flag) —
the same bit-exactness contract as pallas_kernel.py.

Layer math mirrors models/probclass.py's ResShallow exactly: conv0
(first mask) -> res conv1 -> res conv2 + same-step y1 skip (no relu) ->
conv_out (relu'd logits, ref probclass.py:220).

Replaces the 'direct' fallback for kernel_size != 3 (0.018 MP/s measured
in round 2); the reference's own default config is K=5
(ref pc_configs/base:3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import planar
from . import rans
from . import pallas_kernel as pk

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = planar.R
Q_CH = 8          # sublane replication of the scalar q ring (tiling-free)
K_STEPS = planar.K_STEPS


def _round_up(x, m):
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def make_plane_forward(latent_shape: Tuple[int, int, int], K: int, kf: int,
                       L: int, B: int, bsub: int = 1,
                       enc_teacher: bool = False, dec_only: bool = False,
                       interpret: bool = False):
    """Returns (fn, sched). fn(weights, tables, bias_rows, true_syms,
    streams, states, gptr, mode) -> (syms, fsel, ssel, act1, act2, act3,
    states_out, gptr_out); one call = one depth plane.

    weights = (pad_v, w1, w2, w3, w4, centers) — top-slice taps only,
    packed (taps*cin, cout); biases and lower-slice contributions arrive
    in bias_rows (4 arrays (T2_pad, ch, W_ALL) in skewed row layout,
    pre-shifted by CTR*l). true_syms/outputs use the rolled chunk layout
    (lane i*R + r = band cell h_lo + r of image i).

    ``enc_teacher`` builds the ENCODE-ONLY variant: teacher forcing makes
    fsel/ssel/vals depend only on the true symbols, so the whole
    sequential rANS decode simulation (slot lookup, symbol search, word
    gathers, state chain) disappears, along with the decoded-symbol
    output and the stream/states/gptr interfaces (dummy blocks, one
    defensive init write — the K=3 kernel's enc_parallel pattern,
    pallas_kernel.py make_forward).

    ``dec_only`` builds the complementary DECODE-ONLY variant: the
    freq/cdf table outputs (consumed only by the reverse encoder) and
    the teacher-symbol input shrink to dummies. In both variants the
    surviving per-symbol math is the identical traced program as the
    shared kernel's (same masking, same one-hot sums, same ring writes),
    so streams and decoded volumes stay byte-identical — CPU-pinned by
    the split-vs-shared oracle test and TPU-verified via
    tools/ab_streams.py."""
    assert not (enc_teacher and dec_only)
    sched = planar.build_planar_schedule(latent_shape, K)
    BH, CTR, VR = sched.BH, sched.CTR, sched.VR
    reach = planar.geometry(K)[1]
    LSEG = max(sched.HL)
    W_ALL = bsub * LSEG
    BR = bsub * R
    CQB = _round_up(BR, 128)
    T2_pad = sched.T2_pad
    taps = sched.taps
    t1 = len(taps[0])
    tmax = max(len(tp) for tp in taps)
    K1 = t1 * Q_CH
    KD = tmax * kf
    X_K = max(K1, KD)
    wrows = plane_stream_rows(sched, bsub, L)
    # bsub >= 8 halves the step block: the streamed bias-row / activation
    # blocks scale with KS * W_ALL and dominate XLA's scoped-VMEM
    # accounting at 8 lane segments (KS=8 overflowed the 16 MB budget by
    # ~0.9 MB at Kodak scale). Streams are blocking-independent — the
    # per-symbol math never sees KS (same argument as interpret's KS=1).
    KS = 1 if interpret else (K_STEPS // 2 if bsub >= 8 else K_STEPS)
    rans_impl = pk._rans_impl()

    if interpret:
        def _roll(x, s):
            return jnp.roll(x, s, 1)
    else:
        def _roll(x, s):
            return pltpu.roll(x, jnp.asarray(s, jnp.int32)
                              + jnp.int32(x.shape[1]), 1)

    def kernel(table_ref, mode_ref, pad_ref, gin_ref,
               w1_ref, w2_ref, w3_ref, w4_ref, centers_ref,
               actp_ref, acm_ref, b1_ref, b2_ref, b3_ref, b4_ref,
               true_ref, stream_ref, inst_ref, thr_ref,
               sym_out, fsel_out, ssel_out, a1_out, a2_out, a3_out,
               st_out, gout_ref,
               r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s, cnt_s):
        tb = pl.program_id(1)

        @pl.when(tb == 0)
        def _init():
            # Rings need only finiteness: every real read is of a row
            # written earlier in THIS plane (planar.py: off <= CTR).
            r0[:] = jnp.zeros(r0.shape, jnp.float32) + pad_ref[0]
            r1[:] = jnp.zeros(r1.shape, jnp.float32)
            r2[:] = jnp.zeros(r2.shape, jnp.float32)
            r3[:] = jnp.zeros(r3.shape, jnp.float32)
            X[:] = jnp.zeros(X.shape, jnp.float32)
            vals[:] = jnp.zeros(vals.shape, jnp.float32)
            y1s[:] = jnp.zeros(y1s.shape, jnp.float32)
            if enc_teacher:
                # Dead interfaces: one defensive write each.
                sym_out[0, 0] = jnp.zeros((1, 128), jnp.int32)
                st_out[0] = jnp.zeros((1, 128), jnp.uint32)
                gout_ref[0, 0, 0] = 0
            else:
                states_s[:] = inst_ref[0]
                cnt_s[:] = jnp.zeros((1, BR), jnp.int32)
                for i in range(bsub):
                    gptr_s[i] = gin_ref[0, 0, i]
            if dec_only:
                fsel_out[0, 0] = jnp.zeros((1, 128), jnp.int32)
                ssel_out[0, 0] = jnp.zeros((1, 128), jnp.int32)

        for k in range(KS):
            _one_step(k, tb, table_ref, mode_ref, pad_ref,
                      w1_ref, w2_ref, w3_ref, w4_ref, centers_ref,
                      actp_ref, acm_ref, b1_ref, b2_ref, b3_ref, b4_ref,
                      true_ref, stream_ref, thr_ref,
                      sym_out, fsel_out, ssel_out, a1_out, a2_out, a3_out,
                      r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s, cnt_s)

        if not enc_teacher:
            st_out[0] = states_s[:]
            for i in range(bsub):
                # SMEM output: Mosaic only lowers SCALAR stores to SMEM.
                gout_ref[0, 0, i] = gptr_s[i]

    def _one_step(k, tb, table_ref, mode_ref, pad_ref,
                  w1_ref, w2_ref, w3_ref, w4_ref, centers_ref,
                  actp_ref, acm_ref, b1_ref, b2_ref, b3_ref, b4_ref,
                  true_ref, stream_ref, thr_ref,
                  sym_out, fsel_out, ssel_out, a1_out, a2_out, a3_out,
                  r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s, cnt_s):
        t = tb * KS + k

        def rd_slot(off):
            return jax.lax.rem(t + 8 * VR - CTR + off, VR)

        def fill_X(ring, li, ch):
            for o, (dy, dx) in enumerate(taps[li - 1]):
                row = ring[rd_slot(BH * dy + dx)]
                X[o * ch:(o + 1) * ch, :] = _roll(row, -dy)

        def layer_dot(w_ref, b_ref, kdim):
            return jax.lax.dot_general(
                w_ref[:], X[0:kdim, :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b_ref[0, k]

        # Layer 1 (q ring: Q_CH replicated sublanes; w1 expanded likewise).
        fill_X(r0, 1, Q_CH)
        y1 = jax.nn.relu(layer_dot(w1_ref, b1_ref, K1))
        y1s[:] = y1
        r1[rd_slot(CTR)] = y1
        a1_out[0, k] = y1

        # Layer 2.
        fill_X(r1, 2, kf)
        y2 = jax.nn.relu(layer_dot(w2_ref, b2_ref, len(taps[1]) * kf))
        r2[rd_slot(CTR)] = y2
        a2_out[0, k] = y2

        # Layer 3: + same-step y1 skip at static lane shift K-1, no relu
        # ((K-1)*(BH+1) = 2*CTR, see planar.py).
        fill_X(r2, 3, kf)
        y3 = layer_dot(w3_ref, b3_ref, len(taps[2]) * kf) \
            + _roll(y1s[:], -(K - 1))
        r3[rd_slot(CTR)] = y3
        a3_out[0, k] = y3

        # Layer 4: logits, rolled so the band starts at lane 0 of each
        # image segment (one R-lane rANS chunk per step).
        fill_X(r3, 4, kf)
        h_lo = table_ref[k, 0, 0]
        logits = jax.nn.relu(layer_dot(w4_ref, b4_ref, len(taps[3]) * kf))
        logits_r = _roll(logits, -h_lo)
        freq, cdf = pk._quantize_cdf_kernel(logits_r, L)

        mode = mode_ref[0]
        lidx = jax.lax.broadcasted_iota(jnp.int32, (L, BR), 0)

        def img_cat(x2d):
            if bsub == 1:
                return x2d[:, 0:R]
            return jnp.concatenate(
                [x2d[:, i * LSEG:i * LSEG + R] for i in range(bsub)], axis=1)

        @pl.when(table_ref[k, 0, 1] != 0)
        def _chunk():
            fq = img_cat(freq)
            cl = img_cat(cdf)
            a = acm_ref[k, :, 0:BR] != 0
            if not enc_teacher:
                # Sequential rANS decode chain — dead under teacher
                # forcing (the selected tables depend only on sym_true).
                st = states_s[:]
                slot_u = st & jnp.uint32(rans.SCALE - 1)
                slot_i = slot_u.astype(jnp.int32)
                symd = jnp.sum((cl <= slot_i).astype(jnp.int32),
                               axis=0, keepdims=True) - 1
                ohd = lidx == symd
                fd = jnp.sum(jnp.where(ohd, fq, 0), axis=0, keepdims=True)
                sd = jnp.sum(jnp.where(ohd, cl, 0), axis=0, keepdims=True)
                x = (fd.astype(jnp.uint32) * (st >> rans.SCALE_BITS)
                     + slot_u - sd.astype(jnp.uint32))
                # Tail packing (container v8, rans.scalar_encode): the
                # pull test switches off once a lane has decoded
                # thresh = total - k symbols — the encoder's x0=1 warmup
                # emitted nothing there. The driver passes a per-PLANE
                # adjusted threshold (global thresh minus the preceding
                # planes' per-lane symbol counts — the active mask is
                # identical for every plane); legacy streams pass a huge
                # thresh and the guard never binds.
                need = (a & (x < jnp.uint32(rans.RANS_L))
                        & (cnt_s[:] < thr_ref[0]))
                cnt_s[:] = cnt_s[:] + a.astype(jnp.int32)
                ni = need.astype(jnp.int32)
                rank = pk._excl_rank(ni, bsub)
                wparts = []
                for i in range(bsub):
                    gp = gptr_s[i]
                    grow = jnp.minimum(gp // 128, wrows - 2)
                    goff = gp - grow * 128
                    rbase = i * wrows
                    row0 = stream_ref[0, pl.ds(rbase + grow, 1),
                                      :].astype(jnp.int32)
                    row1 = stream_ref[0, pl.ds(rbase + grow + 1, 1),
                                      :].astype(jnp.int32)
                    pos = jnp.where(need[:, i * R:(i + 1) * R],
                                    goff + rank[:, i * R:(i + 1) * R], -1)
                    wparts.append(pk._gather_words(row0, row1, pos))
                    gptr_s[i] = gp + jnp.sum(ni[:, i * R:(i + 1) * R])
                wsel = (wparts[0] if bsub == 1
                        else jnp.concatenate(wparts, axis=1))
                x = jnp.where(need,
                              (x << rans.WORD_BITS) | wsel.astype(jnp.uint32),
                              x)
                states_s[:] = jnp.where(a, x, st)

            if enc_teacher:
                sym = true_ref[0, k, :, 0:BR]
            elif dec_only:
                sym = symd
            else:
                sym_true = true_ref[0, k, :, 0:BR]
                sym = jnp.where(mode == 1, sym_true, symd)
            sym = jnp.where(a, sym, 0)
            ohs = lidx == sym
            if not dec_only:
                fsel = jnp.sum(jnp.where(ohs, fq, 0), axis=0, keepdims=True)
                ssel = jnp.sum(jnp.where(ohs, cl, 0), axis=0, keepdims=True)
                fsel_out[0, k, :, 0:BR] = fsel
                ssel_out[0, k, :, 0:BR] = ssel
            v = jnp.sum(jnp.where(ohs, centers_ref[:], 0.0),
                        axis=0, keepdims=True)
            for i in range(bsub):
                vals[:, i * LSEG:i * LSEG + R] = v[:, i * R:(i + 1) * R]
            if not enc_teacher:
                sym_out[0, k, :, 0:BR] = sym

        # Q-row write: v_0 = t; latent band cells (rolled chunk coords)
        # land at lane h0 = h + reach => unroll by h_lo + reach, pad
        # elsewhere (real pad cells AND junk lanes; wrapped junk always
        # lands below the active window — see planar.py).
        pad = pad_ref[0]
        placed = _roll(vals[:], h_lo + reach)
        rect = jnp.where(actp_ref[k] != 0, placed, pad)
        r0[rd_slot(CTR)] = jnp.zeros((Q_CH, W_ALL), jnp.float32) + rect

    TB = T2_pad // KS
    grid = (B, TB)
    # Dead interfaces under the split variants shrink to one small block
    # with a constant index map (the K=3 kernel's dummy pattern): no
    # per-step DMA, near-zero VMEM.
    if enc_teacher:
        gin_spec = pl.BlockSpec((1, 1, 1), lambda b, t: (0, 0, 0),
                                memory_space=pltpu.SMEM)
        stream_spec = pl.BlockSpec((1, 1, 128), lambda b, t: (0, 0, 0))
        inst_spec = pl.BlockSpec((1, 1, 128), lambda b, t: (0, 0, 0))
        sym_spec = pl.BlockSpec((1, 1, 1, 128), lambda b, t: (0, 0, 0, 0))
        sym_shape = jax.ShapeDtypeStruct((1, 1, 1, 128), jnp.int32)
        st_spec = pl.BlockSpec((1, 1, 128), lambda b, t: (0, 0, 0))
        st_shape = jax.ShapeDtypeStruct((1, 1, 128), jnp.uint32)
        gout_spec = pl.BlockSpec((1, 1, 1), lambda b, t: (0, 0, 0),
                                 memory_space=pltpu.SMEM)
        gout_shape = jax.ShapeDtypeStruct((1, 1, 1), jnp.int32)
    else:
        gin_spec = pl.BlockSpec((1, 1, bsub), lambda b, t: (b, 0, 0),
                                memory_space=pltpu.SMEM)
        stream_spec = pl.BlockSpec((1, bsub * wrows, 128),
                                   lambda b, t: (b, 0, 0))
        inst_spec = pl.BlockSpec((1, 1, BR), lambda b, t: (b, 0, 0))
        sym_spec = pl.BlockSpec((1, KS, 1, CQB), lambda b, t: (b, t, 0, 0))
        sym_shape = jax.ShapeDtypeStruct((B, T2_pad, 1, CQB), jnp.int32)
        st_spec = pl.BlockSpec((1, 1, BR), lambda b, t: (b, 0, 0))
        st_shape = jax.ShapeDtypeStruct((B, 1, BR), jnp.uint32)
        gout_spec = pl.BlockSpec((1, 1, bsub), lambda b, t: (b, 0, 0),
                                 memory_space=pltpu.SMEM)
        gout_shape = jax.ShapeDtypeStruct((B, 1, bsub), jnp.int32)
    if dec_only:
        true_spec = pl.BlockSpec((1, 1, 1, 128), lambda b, t: (0, 0, 0, 0))
        tab_spec = pl.BlockSpec((1, 1, 1, 128), lambda b, t: (0, 0, 0, 0))
        tab_shape = jax.ShapeDtypeStruct((1, 1, 1, 128), jnp.int32)
    else:
        true_spec = pl.BlockSpec((1, KS, 1, CQB), lambda b, t: (b, t, 0, 0))
        tab_spec = pl.BlockSpec((1, KS, 1, CQB), lambda b, t: (b, t, 0, 0))
        tab_shape = jax.ShapeDtypeStruct((B, T2_pad, 1, CQB), jnp.int32)
    in_specs = [
        pl.BlockSpec((KS, 1, 2), lambda b, t: (t, 0, 0),
                     memory_space=pltpu.SMEM),                       # table
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # mode
        pl.BlockSpec(memory_space=pltpu.SMEM),                      # pad
        gin_spec,                                                   # gptr in
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # w1
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # w2
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # w3
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # w4
        pl.BlockSpec(memory_space=pltpu.VMEM),                      # centers
        pl.BlockSpec((KS, 1, W_ALL), lambda b, t: (t, 0, 0)),       # act_pl
        pl.BlockSpec((KS, 1, CQB), lambda b, t: (t, 0, 0)),         # act_cm
        pl.BlockSpec((1, KS, kf, W_ALL), lambda b, t: (b, t, 0, 0)),  # bias1
        pl.BlockSpec((1, KS, kf, W_ALL), lambda b, t: (b, t, 0, 0)),  # bias2
        pl.BlockSpec((1, KS, kf, W_ALL), lambda b, t: (b, t, 0, 0)),  # bias3
        pl.BlockSpec((1, KS, L, W_ALL), lambda b, t: (b, t, 0, 0)),   # bias4
        true_spec,                                                  # true
        stream_spec,                                                # stream
        inst_spec,                                                  # states
        (pl.BlockSpec((1, 1, 128), lambda b, t: (0, 0, 0)) if enc_teacher
         else pl.BlockSpec((1, 1, BR), lambda b, t: (b, 0, 0))),    # thresh
    ]
    out_specs = (
        sym_spec,
        tab_spec,
        tab_spec,
        pl.BlockSpec((1, KS, kf, W_ALL), lambda b, t: (b, t, 0, 0)),
        pl.BlockSpec((1, KS, kf, W_ALL), lambda b, t: (b, t, 0, 0)),
        pl.BlockSpec((1, KS, kf, W_ALL), lambda b, t: (b, t, 0, 0)),
        st_spec,
        gout_spec,
    )
    out_shape = (
        sym_shape,
        tab_shape,
        tab_shape,
        jax.ShapeDtypeStruct((B, T2_pad, kf, W_ALL), jnp.float32),
        jax.ShapeDtypeStruct((B, T2_pad, kf, W_ALL), jnp.float32),
        jax.ShapeDtypeStruct((B, T2_pad, kf, W_ALL), jnp.float32),
        st_shape,
        gout_shape,
    )
    scratch = [
        pltpu.VMEM((VR, Q_CH, W_ALL), jnp.float32),      # r0
        pltpu.VMEM((VR, kf, W_ALL), jnp.float32),        # r1
        pltpu.VMEM((VR, kf, W_ALL), jnp.float32),        # r2
        pltpu.VMEM((VR, kf, W_ALL), jnp.float32),        # r3
        pltpu.VMEM((X_K, W_ALL), jnp.float32),           # X
        pltpu.VMEM((kf, W_ALL), jnp.float32),            # y1s
        pltpu.VMEM((1, W_ALL), jnp.float32),             # vals
        pltpu.VMEM((1, BR), jnp.uint32),                 # states
        pltpu.SMEM((bsub,), jnp.int32),                  # gptr
        pltpu.VMEM((1, BR), jnp.int32),                  # cnt (tail packing)
    ]

    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))

    def fn(weights, tables, bias_rows, true_syms, streams, states, gptr,
           mode, thresh=None):
        pad_v, w1, w2, w3, w4, centers = weights
        table, actp, acm = tables
        b1, b2, b3, b4 = bias_rows
        if thresh is None:     # legacy / encode: the guard must never bind
            tsh = ((1, 1, 128) if enc_teacher else
                   (states.shape[0], 1, BR))
            thresh = jnp.full(tsh, np.iinfo(np.int32).max // 2, jnp.int32)
        return call(table, mode, pad_v, gptr, w1, w2, w3, w4, centers,
                    actp, acm, b1, b2, b3, b4, true_syms, streams, states,
                    thresh)

    return fn, sched


def plane_stream_rows(sched, bsub: int, L: int = 0) -> int:
    """Whole-image stream rows resident in VMEM. bsub <= 2 keeps the
    full 16-bit/symbol capacity; bsub >= 4 caps at ceil(log2(L)) + 1
    bits/symbol (above the max-entropy worst case + lane flush) so 4-8
    stream segments fit the 16 MB VMEM. The driver checks real streams
    against the cap — encode re-runs overflowing batches through the
    full-capacity bsub<=2 kernels and decode routes over-cap streams
    there likewise (planar_codec.py); the kernels clamp their row
    pointers, so a pathological overflow corrupts (CRC-caught), never
    crashes."""
    full = sched.wcap // 128 + 2
    if bsub <= 2 or L <= 0:
        return full
    C, H, W = sched.latent_shape
    bits = max(1, (L - 1).bit_length()) + 1
    words = C * H * W * bits // 16
    return min(full, _round_up(words + 2 * R, 128) // 128 + 2)


# ---------------------------------------------------------------------------
# Reverse interleaved-rANS encoder over the full (plane, step) sequence.
# Mirrors pallas_kernel.make_reverse with S=1 chunk per step; fsel/ssel
# arrive as (B, C*T2_pad, 1, CQB) in coding order.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def make_plane_reverse(latent_shape: Tuple[int, int, int], K: int, B: int,
                       bsub: int = 1, L: int = 0, interpret: bool = False,
                       x0: int = rans.RANS_L):
    """x0 = 1 is container-v8 tail packing (rans.scalar_encode): lanes
    seed below RANS_L, the per-lane warmup counts k are transmitted, and
    the decoder suppresses its pull test for each lane's last k symbols
    (make_plane_forward's thresh input — mirrors pallas_kernel.
    make_reverse). x0 = RANS_L reproduces the classic streams (k all
    zero)."""
    sched = planar.build_planar_schedule(latent_shape, K)
    C = latent_shape[0]
    BR = bsub * R
    CQB = _round_up(BR, 128)
    NROW = C * sched.T2_pad
    wrows = plane_stream_rows(sched, bsub, L)
    KS = 1 if interpret else K_STEPS

    def kernel(table_ref, act_ref, fsel_ref, ssel_ref,
               words_out, nw_out, st_out, k_out, states_s, gw_s, kc_s):
        tb = pl.program_id(1)

        @pl.when(tb == 0)
        def _init():
            states_s[:] = jnp.full((1, BR), x0, jnp.uint32)
            kc_s[:] = jnp.zeros((1, BR), jnp.int32)
            for i in range(bsub):
                gw_s[i] = 0
            words_out[:] = jnp.zeros(words_out.shape, jnp.uint32)

        for k in range(KS - 1, -1, -1):
            @pl.when(table_ref[k, 0, 1] != 0)
            def _sub(k=k):
                f = jnp.maximum(fsel_ref[0, k, :, 0:BR],
                                1).astype(jnp.uint32)
                sv = ssel_ref[0, k, :, 0:BR].astype(jnp.uint32)
                a = act_ref[k, :, 0:BR] != 0
                st = states_s[:]
                if x0 < rans.RANS_L:
                    # warmup count: pre-renorm state below RANS_L (no
                    # emission is possible there: f << 16 >= RANS_L > st)
                    kc_s[:] = kc_s[:] + (
                        a & (st < jnp.uint32(rans.RANS_L))).astype(jnp.int32)
                emit = a & (st >= (f << rans.WORD_BITS))
                word = (st & jnp.uint32(rans.WORD_MASK)).astype(jnp.int32)
                ei = emit.astype(jnp.int32)
                fwd = pk._excl_rank(ei, bsub)
                for i in range(bsub):
                    sl = slice(i * R, (i + 1) * R)
                    total_i = jnp.sum(ei[:, sl])
                    gw = gw_s[i]
                    grow = jnp.minimum(gw // 128, wrows - 2)
                    goff = gw - grow * 128
                    pos = jnp.where(emit[:, sl],
                                    goff + total_i - 1 - fwd[:, sl], -1)
                    r0n, r1n, m0, m1 = pk._scatter_words(word[:, sl], pos,
                                                         emit[:, sl])
                    rbase = i * wrows
                    old0 = words_out[0, pl.ds(rbase + grow, 1),
                                     :].astype(jnp.int32)
                    old1 = words_out[0, pl.ds(rbase + grow + 1, 1),
                                     :].astype(jnp.int32)
                    words_out[0, pl.ds(rbase + grow, 1), :] = jnp.where(
                        m0, r0n, old0).astype(jnp.uint32)
                    words_out[0, pl.ds(rbase + grow + 1, 1), :] = \
                        jnp.where(m1, r1n, old1).astype(jnp.uint32)
                    gw_s[i] = gw + total_i
                st = jnp.where(emit, st >> rans.WORD_BITS, st)
                xn = ((st // f) << rans.SCALE_BITS) + (st % f) + sv
                states_s[:] = jnp.where(a, xn, st)

        iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bsub), 2)
        row = jnp.zeros((1, 1, bsub), jnp.int32)
        for i in range(bsub):
            row = row + jnp.where(iota_b == i, gw_s[i], 0)
        nw_out[:] = row
        st_out[0] = states_s[:]
        k_out[0] = kc_s[:]

    TB = NROW // KS
    grid = (B, TB)
    in_specs = [
        pl.BlockSpec((KS, 1, 2), lambda b, t: (TB - 1 - t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((KS, 1, CQB), lambda b, t: (TB - 1 - t, 0, 0)),
        pl.BlockSpec((1, KS, 1, CQB), lambda b, t: (b, TB - 1 - t, 0, 0)),
        pl.BlockSpec((1, KS, 1, CQB), lambda b, t: (b, TB - 1 - t, 0, 0)),
    ]
    out_specs = (pl.BlockSpec((1, bsub * wrows, 128), lambda b, t: (b, 0, 0)),
                 pl.BlockSpec((1, 1, bsub), lambda b, t: (b, 0, 0)),
                 pl.BlockSpec((1, 1, BR), lambda b, t: (b, 0, 0)),
                 pl.BlockSpec((1, 1, BR), lambda b, t: (b, 0, 0)))
    out_shape = (jax.ShapeDtypeStruct((B, bsub * wrows, 128), jnp.uint32),
                 jax.ShapeDtypeStruct((B, 1, bsub), jnp.int32),
                 jax.ShapeDtypeStruct((B, 1, BR), jnp.uint32),
                 jax.ShapeDtypeStruct((B, 1, BR), jnp.int32))
    scratch = [pltpu.VMEM((1, BR), jnp.uint32),
               pltpu.SMEM((bsub,), jnp.int32),
               pltpu.VMEM((1, BR), jnp.int32)]

    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))

    def fn(full_table, full_act_cm, freq_sel, start_sel):
        return call(full_table, full_act_cm, freq_sel, start_sel)

    return fn, sched
