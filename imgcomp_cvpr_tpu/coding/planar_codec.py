"""Driver for the planar (per-depth-plane) Pallas codec — the fast path
for kernel_size != 3 (coding/planar.py documents the design).

External contract matches pallas_codec.PallasCoder: the reverse
interleaved-rANS runs on device, streams self-route via the container
impl id. Two execution modes:

- default (IMGCOMP_PLANAR_SPLIT=1): encode runs an encode-only kernel
  variant (teacher forcing makes the rANS decode simulation dead code)
  and decode a decode-only variant, each FUSED with its pre/post work
  into ONE device dispatch. The surviving per-symbol math is the
  identical traced program in both variants and the surrounding XLA
  bias convs are the same code in both jits; stream byte-identity vs
  the shared executable is CPU-pinned (oracle test in test_planar.py)
  and TPU-verified (tools/ab_streams.py), and the per-batch container
  CRC catches any executable divergence loudly at decode time.
- IMGCOMP_PLANAR_SPLIT=0: encode is teacher-forced through the SAME
  jitted lax.scan-over-depth executable decode uses (traced mode flag)
  — bit-exactness by construction (two separately-jitted copies could
  legally fuse the bias convs differently; the shared executable makes
  that impossible rather than merely detectable).

Replaces the reference's per-symbol sess.run + Python coder for its
DEFAULT K=5 configuration (ref pc_configs/base:3, bit_counter.py:103-163;
round 2 left K!=5 on a 0.018 MP/s 'direct' fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import probclass as pc_lib
from . import planar
from . import planar_kernel as plk
from . import rans

R = planar.R


def _use_interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _round_up(x, m):
    return -(-x // m) * m


class PlanarCoder:
    """Entropy codec for one (pc_config, num_centers) context model with
    kernel_size != 3 (any K the causal-mask geometry admits; the
    reference's default K=5 is the target). Requires the latent band to
    fit one rANS chunk: ceil(W/(4*(K//2)+1)) <= 32 — true for Kodak-scale
    latents in either orientation."""

    def __init__(self, pc: pc_lib.ProbClassifier, pc_config, mesh=None):
        self.pc = pc
        self.pc_config = pc_config
        self.K = pc_config.kernel_size
        self.kf = pc_config.arch_param__k
        self.L = pc.num_centers
        self.mesh = mesh
        # Adaptive stream-row prediction for the submit-time fused row
        # gather (mirrors PallasCoder._rneed_pred).
        self._rneed_pred = {}

    def _shard_wrap(self, fn, n_rep, n_batch, n_out):
        """jit fn; with a mesh, shard_map it with the first n_rep args
        replicated and the next n_batch args batch-sharded (dim 0)."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P
        from ..parallel import mesh as mesh_lib
        d = P(mesh_lib.DATA_AXIS)
        in_specs = (P(),) * n_rep + (d,) * n_batch
        return jax.jit(jax.shard_map(
            fn, mesh=self.mesh, in_specs=in_specs,
            out_specs=(d,) * n_out if n_out > 1 else d,
            check_vma=False))

    @staticmethod
    def _pick_bsub(bl: int, bsub_max=None) -> int:
        import os
        forced = os.environ.get('IMGCOMP_PLANAR_BSUB')
        if forced:
            b = int(forced)
            return min(b, bsub_max) if bsub_max else b
        # 8 segments fit scoped VMEM via the kernel's halved KS=4 step
        # blocks (planar_kernel.make_plane_forward); streams stay bitwise
        # identical across bsub (tested).
        for d in (8, 4, 2):
            if d <= (bsub_max or d) and bl % d == 0:
                return d
        return 1

    # -- layouts --------------------------------------------------------------

    @functools.lru_cache(maxsize=8)
    def _layouts(self, latent_shape, bsub):
        sched = planar.build_planar_schedule(latent_shape, self.K)
        C, H, W = latent_shape
        kd, reach, BH, CTR = planar.geometry(self.K)
        LSEG = max(sched.HL)
        W_ALL = bsub * LSEG
        BR = bsub * R
        CQB = _round_up(BR, 128)
        T2_pad = sched.T2_pad

        # Chunk mask / q-row plane mask, tiled per image segment.
        acm = np.zeros((T2_pad, 1, CQB), np.int32)
        for i in range(bsub):
            acm[:, :, i * R:(i + 1) * R] = sched.active_cm
        t_arr = np.arange(T2_pad)
        h0 = np.arange(LSEG)
        w0 = t_arr[:, None] - BH * h0[None, :]
        ap1 = ((h0[None, :] >= reach) & (h0[None, :] < reach + H)
               & (w0 >= reach) & (w0 < reach + W)).astype(np.int32)
        actp = np.zeros((T2_pad, 1, W_ALL), np.int32)
        for i in range(bsub):
            actp[:, 0, i * LSEG:(i + 1) * LSEG] = ap1

        # Teacher pack / symbol unpack (plane-local, group chunk-major).
        HW = H * W
        idx = np.full((T2_pad, CQB), bsub * HW, np.int64)
        for i in range(bsub):
            src = sched.idx_cm.astype(np.int64)          # (T2_pad, R)
            idx[:, i * R:(i + 1) * R] = np.where(src < HW, src + i * HW,
                                                 bsub * HW)
        idx_flat = jnp.asarray(idx.reshape(-1).astype(np.int32))
        flat_np = idx.reshape(-1)
        inv_np = np.zeros(bsub * HW, np.int32)
        valid_np = flat_np < bsub * HW
        inv_np[flat_np[valid_np]] = np.nonzero(valid_np)[0].astype(np.int32)
        inv_idx = jnp.asarray(inv_np)

        # Reverse-kernel tables over the flat (plane, step) sequence.
        full_table = jnp.asarray(np.tile(sched.table[:, :, :2], (C, 1, 1)))
        full_acm = jnp.asarray(np.tile(acm, (C, 1, 1)))

        tables = (jnp.asarray(sched.table), jnp.asarray(actp),
                  jnp.asarray(acm))
        from . import codec as codec_lib
        wts_img = jnp.asarray(codec_lib.crc_weights(HW * C))
        return (sched, tables, idx_flat, inv_idx, full_table, full_acm,
                wts_img, LSEG, W_ALL, BR, CQB)

    # -- compiled pieces ------------------------------------------------------

    @functools.lru_cache(maxsize=8)
    def _run_fns(self, latent_shape, b, bsub_max=None):
        interp = _use_interpret()
        ndev = 1 if self.mesh is None else int(self.mesh.devices.size)
        assert b % ndev == 0, (b, ndev)
        bl = b // ndev
        bsub = self._pick_bsub(bl, bsub_max)
        assert bl % bsub == 0, (bl, bsub)
        b_out = bl // bsub
        (sched, tables, idx_flat, inv_idx, full_table, full_acm, wts_img,
         LSEG, W_ALL, BR, CQB) = self._layouts(latent_shape, bsub)
        C, H, W = latent_shape
        kd, reach, BH, CTR = planar.geometry(self.K)
        K, kf, L = self.K, self.kf, self.L
        grids = sched.grids
        T2_pad = sched.T2_pad
        wrows = plk.plane_stream_rows(sched, bsub, self.L)
        HW = H * W
        pc = self.pc
        pc_config = self.pc_config
        taps = sched.taps
        Q_CH = plk.Q_CH

        # Enc/dec kernel variant split (the K=3 kernel's round-6 win,
        # VERDICT r3 #2): the encode-only kernel drops the whole
        # sequential rANS decode simulation (teacher forcing makes
        # fsel/ssel independent of the state chain) plus its
        # stream/state/symbol interfaces; the decode-only kernel drops
        # the fsel/ssel outputs and the teacher input. With the split,
        # encode and decode no longer share one executable — bit-
        # exactness instead rests on (a) the per-symbol math being the
        # identical traced program in both variants (split-vs-shared
        # stream equality is CPU-pinned and TPU-verified via
        # tools/ab_streams.py) and (b) the per-batch container CRC that
        # catches any divergence loudly. It also frees both directions
        # to fuse everything into ONE dispatch each (reverse rANS +
        # theo + CRC + row gather ride the encode jit; stream padding +
        # unpack + CRC ride the decode jit). IMGCOMP_PLANAR_SPLIT=0
        # falls back to the shared-executable path.
        import os as _os
        split = _os.environ.get('IMGCOMP_PLANAR_SPLIT', '1') != '0'
        if split:
            fwd_enc, _ = plk.make_plane_forward(
                latent_shape, K, kf, L, b_out, bsub=bsub,
                enc_teacher=True, interpret=interp)
            fwd_dec, _ = plk.make_plane_forward(
                latent_shape, K, kf, L, b_out, bsub=bsub,
                dec_only=True, interpret=interp)
            fwd = None    # the shared kernel is never built on this path
        else:
            fwd, _ = plk.make_plane_forward(latent_shape, K, kf, L, b_out,
                                            bsub=bsub, interpret=interp)

        def _rev_kernel(x0):
            return plk.make_plane_reverse(latent_shape, K, b_out, bsub=bsub,
                                          L=L, interpret=interp, x0=x0)[0]

        # Per-lane active totals: the active mask is identical for every
        # plane (full_acm tiles acm) and every image slot, so a lane's
        # full-volume total is C * (its per-plane count) — the base of the
        # v8 tail-packing pull threshold (mirrors pallas_codec).
        from . import codec as codec_lib
        acm_np = np.asarray(tables[2])[:, 0, :]       # (T2_pad, CQB)
        plane_tot = acm_np[:, :BR].sum(axis=0).astype(np.int32)   # (BR,)
        for i in range(1, bsub):
            assert (plane_tot[i * R:(i + 1) * R]
                    == plane_tot[:R]).all(), 'image slots differ in schedule'
        lane_totals = (C * plane_tot[:R]).astype(np.int32)
        x0_enc = codec_lib._rans_x0()
        if int(lane_totals.max()) < codec_lib.TAIL_MIN_LANE_SYMBOLS:
            x0_enc = rans.RANS_L
        plane_tot_j = jnp.asarray(plane_tot)          # (BR,) i32

        def _thresh_seq(thresh):
            # Per-PLANE pull thresholds for the forward kernel: the kernel
            # counts decoded symbols within ONE plane, so plane c's
            # threshold is the global one minus the c preceding planes'
            # per-lane counts. Legacy/huge thresholds stay huge.
            return (thresh.astype(jnp.int32)[None]
                    - jnp.arange(C, dtype=jnp.int32)[:, None, None, None]
                    * plane_tot_j[None, None, None, :])

        def fold_weights(pc_params):
            params = pc_params['params']
            names = [('conv0',), ('res1', 'conv1'), ('res1', 'conv2'),
                     ('conv_out',)]
            tops, lows, bs = [], [], []
            for li, name in enumerate(names):
                node = params
                for n in name:
                    node = node[n]
                w = node['w']                      # (kd, K, K, cin, cout)
                tp = taps[li]
                top = jnp.stack([w[kd - 1, dy, dx] for dy, dx in tp],
                                axis=0)            # (taps, cin, cout)
                tops.append(top)
                lows.append(w[:kd - 1])
                bs.append(node['b'])
            t1 = len(taps[0])
            # layer 1: the single input channel expands to Q_CH sublanes
            # (only sublane 0 of each tap group carries weight).
            w1 = jnp.zeros((t1, Q_CH, kf), jnp.float32).at[:, 0, :].set(
                tops[0][:, 0, :]).reshape(t1 * Q_CH, kf)
            w2 = tops[1].reshape(len(taps[1]) * kf, kf)
            w3 = tops[2].reshape(len(taps[2]) * kf, kf)
            w4 = tops[3].reshape(len(taps[3]) * kf, L)
            return (w1, w2, w3, w4), lows, bs

        def conv_lower(planes, w_low):
            """planes: (kd-1, bl, Hg, Wg, cin), oldest first;
            w_low: (kd-1, K, K, cin, cout) -> (bl, Hg-K+1, Wg-K+1, cout)."""
            out = None
            for j in range(kd - 1):
                y = jax.lax.conv_general_dilated(
                    planes[j], w_low[j], (1, 1), 'VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                out = y if out is None else out + y
            return out

        def skew_bias(bias_nhwc, li):
            """(bl, Hg, Wg, ch) -> (b_out, T2_pad, ch, W_ALL) banded rows,
            pre-shifted by CTR*li so the kernel indexes them by step t."""
            x = jnp.transpose(bias_nhwc, (0, 3, 1, 2))   # (bl, ch, Hg, Wg)
            rows = jax.vmap(
                lambda p: planar.skew_rows(p, BH, T2_pad, LSEG))(x)
            sh = CTR * li
            if sh:
                rows = jnp.concatenate(
                    [jnp.zeros((rows.shape[0], sh) + rows.shape[2:],
                               rows.dtype), rows[:, :T2_pad - sh]], axis=1)
            ch = rows.shape[2]
            rows = rows.reshape(b_out, bsub, T2_pad, ch, LSEG)
            rows = jnp.transpose(rows, (0, 2, 3, 1, 4))
            return rows.reshape(b_out, T2_pad, ch, bsub * LSEG)

        def unskew_act(rows_out, li, grid_hw):
            """(b_out, T2_pad, kf, W_ALL) kernel rows -> (bl, Hg, Wg, kf)."""
            sh = CTR * li
            r = rows_out[:, sh:]
            r = r.reshape(b_out, -1, kf, bsub, LSEG)
            r = jnp.transpose(r, (0, 3, 1, 2, 4))
            r = r.reshape(b_out * bsub, -1, kf, LSEG)
            planes = jax.vmap(
                lambda rr: planar.unskew_rows(rr, BH, grid_hw))(r)
            return jnp.transpose(planes, (0, 2, 3, 1))   # (bl, Hg, Wg, kf)

        def run(pc_params, centers, mode, symbols_flat, streams, states0,
                thresh):
            """THE shared executable: teacher-forced encode (mode 1) and
            decode (mode 0) trace through this one jit. symbols_flat
            (bl, n) is the teacher input (dummy zeros at decode); streams
            (b_out, bsub*wrows, 128) is the coded stream (dummy zeros at
            encode); states0 (b_out, 1, BR) the initial rANS states;
            thresh (b_out, 1, BR) the global tail-packing pull threshold
            (huge at encode and for legacy streams — the guard never
            binds, so pre-tail-packing streams are unchanged).
            Returns (syms, fsel, ssel) each (b_out, C*T2_pad, 1, CQB) in
            coding order."""
            (w1, w2, w3, w4), lows, bs = fold_weights(pc_params)
            pad_value = pc_lib.auto_pad_value(pc_config, centers, pc_params)
            pad_v = jnp.full((1,), pad_value, jnp.float32)
            from .ring import _pad_constants
            k1, k2, k3 = _pad_constants(pc, pc_params, pad_value)
            weights = (pad_v, w1, w2, w3, w4, centers[:, None])

            sy = symbols_flat.reshape(b_out, bsub, C, HW).astype(jnp.int32)
            sy = jnp.transpose(sy, (2, 0, 1, 3)).reshape(C, b_out, bsub * HW)
            padded = jnp.concatenate(
                [sy, jnp.zeros((C, b_out, 1), jnp.int32)], axis=2)
            true_planes = jnp.take(padded, idx_flat, axis=2).reshape(
                C, b_out, T2_pad, 1, CQB)

            def bc(v, grid_hw, ch):
                return jnp.broadcast_to(
                    v, (kd - 1, bl) + grid_hw + (ch,)) + 0.0

            q_hist = jnp.full((kd - 1, bl) + grids[0] + (1,), pad_value,
                              jnp.float32)
            a1_hist = bc(k1, grids[1], kf)
            a2_hist = bc(k2, grids[2], kf)
            a3_hist = bc(k3, grids[3], kf)
            gptr0 = jnp.zeros((b_out, 1, bsub), jnp.int32)

            def body(carry, xs):
                true_plane, th_c = xs
                q_hist, a1_hist, a2_hist, a3_hist, states, gptr = carry
                bias_rows = (
                    skew_bias(conv_lower(q_hist, lows[0]) + bs[0], 1),
                    skew_bias(conv_lower(a1_hist, lows[1]) + bs[1], 2),
                    skew_bias(conv_lower(a2_hist, lows[2]) + bs[2], 3),
                    skew_bias(conv_lower(a3_hist, lows[3]) + bs[3], 4))
                (syms, fsel, ssel, a1r, a2r, a3r, states, gptr) = fwd(
                    weights, tables, bias_rows, true_plane, streams,
                    states, gptr, mode, thresh=th_c)
                # Rebuild planes for the next plane's bias convs.
                sym_flat = jnp.take(
                    syms.reshape(b_out, T2_pad * CQB), inv_idx,
                    axis=1).reshape(bl, H, W)
                qp = jnp.take(centers, jnp.clip(sym_flat, 0, L - 1))
                q_plane = jnp.full((bl,) + grids[0], pad_value, jnp.float32)
                q_plane = q_plane.at[:, reach:reach + H,
                                     reach:reach + W].set(qp)[..., None]
                carry = (
                    jnp.concatenate([q_hist[1:], q_plane[None]], axis=0),
                    jnp.concatenate([a1_hist[1:],
                                     unskew_act(a1r, 1, grids[1])[None]], 0),
                    jnp.concatenate([a2_hist[1:],
                                     unskew_act(a2r, 2, grids[2])[None]], 0),
                    jnp.concatenate([a3_hist[1:],
                                     unskew_act(a3r, 3, grids[3])[None]], 0),
                    states, gptr)
                return carry, (syms, fsel, ssel)

            _, (syms_all, fsel_all, ssel_all) = jax.lax.scan(
                body, (q_hist, a1_hist, a2_hist, a3_hist, states0, gptr0),
                (true_planes, _thresh_seq(thresh)))

            def co(x):   # (C, b_out, T2_pad, 1, CQB) -> coding order
                return jnp.transpose(x, (1, 0, 2, 3, 4)).reshape(
                    b_out, C * T2_pad, 1, CQB)

            return co(syms_all), co(fsel_all), co(ssel_all)

        def run_enc(pc_params, centers, symbols_flat):
            """Teacher-forced encode scan through the enc-only kernel:
            same bias convs / skew / history code as `run`, q planes
            rebuilt from the TRUE symbols (identical values to the
            decoded ones under teacher forcing). Returns (fsel, ssel)."""
            (w1, w2, w3, w4), lows, bs = fold_weights(pc_params)
            pad_value = pc_lib.auto_pad_value(pc_config, centers, pc_params)
            pad_v = jnp.full((1,), pad_value, jnp.float32)
            from .ring import _pad_constants
            k1, k2, k3 = _pad_constants(pc, pc_params, pad_value)
            weights = (pad_v, w1, w2, w3, w4, centers[:, None])

            sy = symbols_flat.reshape(b_out, bsub, C, HW).astype(jnp.int32)
            sy = jnp.transpose(sy, (2, 0, 1, 3)).reshape(C, b_out, bsub * HW)
            padded = jnp.concatenate(
                [sy, jnp.zeros((C, b_out, 1), jnp.int32)], axis=2)
            true_planes = jnp.take(padded, idx_flat, axis=2).reshape(
                C, b_out, T2_pad, 1, CQB)

            def bc(v, grid_hw, ch):
                return jnp.broadcast_to(
                    v, (kd - 1, bl) + grid_hw + (ch,)) + 0.0

            q_hist = jnp.full((kd - 1, bl) + grids[0] + (1,), pad_value,
                              jnp.float32)
            a1_hist = bc(k1, grids[1], kf)
            a2_hist = bc(k2, grids[2], kf)
            a3_hist = bc(k3, grids[3], kf)
            dummy_stream = jnp.zeros((1, 1, 128), jnp.uint32)
            dummy_state = jnp.zeros((1, 1, 128), jnp.uint32)
            dummy_gptr = jnp.zeros((1, 1, 1), jnp.int32)
            mode1 = jnp.ones((1,), jnp.int32)

            def body(carry, true_plane):
                q_hist, a1_hist, a2_hist, a3_hist = carry
                bias_rows = (
                    skew_bias(conv_lower(q_hist, lows[0]) + bs[0], 1),
                    skew_bias(conv_lower(a1_hist, lows[1]) + bs[1], 2),
                    skew_bias(conv_lower(a2_hist, lows[2]) + bs[2], 3),
                    skew_bias(conv_lower(a3_hist, lows[3]) + bs[3], 4))
                (_sy, fsel, ssel, a1r, a2r, a3r, _st, _gp) = fwd_enc(
                    weights, tables, bias_rows, true_plane, dummy_stream,
                    dummy_state, dummy_gptr, mode1)
                sym_flat = jnp.take(
                    true_plane.reshape(b_out, T2_pad * CQB), inv_idx,
                    axis=1).reshape(bl, H, W)
                qp = jnp.take(centers, jnp.clip(sym_flat, 0, L - 1))
                q_plane = jnp.full((bl,) + grids[0], pad_value, jnp.float32)
                q_plane = q_plane.at[:, reach:reach + H,
                                     reach:reach + W].set(qp)[..., None]
                carry = (
                    jnp.concatenate([q_hist[1:], q_plane[None]], axis=0),
                    jnp.concatenate([a1_hist[1:],
                                     unskew_act(a1r, 1, grids[1])[None]], 0),
                    jnp.concatenate([a2_hist[1:],
                                     unskew_act(a2r, 2, grids[2])[None]], 0),
                    jnp.concatenate([a3_hist[1:],
                                     unskew_act(a3r, 3, grids[3])[None]], 0))
                return carry, (fsel, ssel)

            _, (fsel_all, ssel_all) = jax.lax.scan(
                body, (q_hist, a1_hist, a2_hist, a3_hist), true_planes)

            def co(x):
                return jnp.transpose(x, (1, 0, 2, 3, 4)).reshape(
                    b_out, C * T2_pad, 1, CQB)

            return co(fsel_all), co(ssel_all)

        acm_flat = full_acm.reshape(1, C * T2_pad, CQB)

        def crc_of(symbols_flat):
            from . import codec as codec_lib
            return codec_lib.symbol_crc_device(
                symbols_flat.reshape(bl, -1).astype(jnp.uint32), wts_img)

        def rev_local(rneed, x0, fsel, ssel, symbols_flat):
            # ONE dispatch for everything after the shared run executable:
            # reverse rANS + theoretical bits + symbol CRC + (predicted)
            # stream-row gather — every extra device call costs ~10 ms of
            # remote-dispatch overhead (the K=3 driver's round-4 pattern).
            # The shared `run` jit is untouched, so encode/decode
            # bit-exactness is unaffected.
            words, n_words, st, kw = _rev_kernel(x0)(
                full_table, full_acm, fsel, ssel)
            f = jnp.maximum(fsel[:, :, 0, 0:BR].astype(jnp.float32), 1.0)
            bits = jnp.where(acm_flat[:, :, 0:BR] != 0,
                             -jnp.log2(f / rans.SCALE), 0.0)
            theo = jnp.sum(bits.reshape(b_out, C * T2_pad, bsub, R),
                           axis=(1, 3)).reshape(b_out * bsub)
            outs = (words, n_words, st, kw, theo, crc_of(symbols_flat))
            if not rneed:
                return outs
            row_idx = jnp.asarray(np.concatenate(
                [np.arange(i * wrows, i * wrows + rneed)
                 for i in range(bsub)]))
            sel = jnp.take(words, row_idx, axis=1).astype(jnp.uint16)
            return outs + (sel,)

        rev_cache = {}

        def rev_dev(fsel, ssel, symbols_flat, rneed=0, x0=None):
            x0 = x0_enc if x0 is None else x0
            key = (rneed, x0)
            if key not in rev_cache:
                rev_cache[key] = self._shard_wrap(
                    functools.partial(rev_local, rneed, x0),
                    n_rep=0, n_batch=3, n_out=6 + (1 if rneed else 0))
            return rev_cache[key](fsel, ssel, symbols_flat)

        take_cache = {}

        def take_fn(rneed):
            # Exact re-gather fallback on presel underprediction.
            if rneed not in take_cache:
                row_idx = jnp.asarray(np.concatenate(
                    [np.arange(i * wrows, i * wrows + rneed)
                     for i in range(bsub)]))
                take_cache[rneed] = jax.jit(
                    lambda w: jnp.take(w, row_idx, axis=1)
                    .astype(jnp.uint16))
            return take_cache[rneed]

        def unpack(syms_co):
            flat = syms_co.reshape(b_out, C, T2_pad * CQB)
            vols = jnp.take(flat, inv_idx, axis=2)      # (b_out, C, bsub*HW)
            vols = vols.reshape(b_out, C, bsub, HW)
            out = jnp.transpose(vols, (0, 2, 1, 3)).reshape(bl, C * HW)
            return out.astype(jnp.int8), crc_of(out)

        # -- fused one-dispatch encode / decode (split mode only) ---------

        def encode_full_local(rneed, x0, pc_params, centers, symbols_flat):
            fsel, ssel = run_enc(pc_params, centers, symbols_flat)
            return rev_local(rneed, x0, fsel, ssel, symbols_flat)

        enc_full_cache = {}

        def encode_full_dev(pc_params, centers, symbols_flat, rneed=0,
                            x0=None):
            x0 = x0_enc if x0 is None else x0
            key = (rneed, x0)
            if key not in enc_full_cache:
                enc_full_cache[key] = self._shard_wrap(
                    functools.partial(encode_full_local, rneed, x0),
                    n_rep=2, n_batch=1, n_out=6 + (1 if rneed else 0))
            return enc_full_cache[key](pc_params, centers, symbols_flat)

        def decode_full_local(rows_b, pc_params, centers, words_u16,
                              states_in, thresh):
            """words_u16: (b_grp, bsub, rows_b, 128) wire words;
            states_in: (b_grp, 1, BR); thresh (b_grp, 1, BR) the global
            tail-packing pull threshold (huge for legacy streams). Stream
            padding + the decode scan + unpack + CRC in ONE executable."""
            bg = words_u16.shape[0]
            streams = jnp.zeros((bg, bsub * wrows, 128), jnp.uint32)
            for j in range(bsub):
                streams = streams.at[:, j * wrows:j * wrows + rows_b].set(
                    words_u16[:, j].astype(jnp.uint32))
            (w1, w2, w3, w4), lows, bs = fold_weights(pc_params)
            pad_value = pc_lib.auto_pad_value(pc_config, centers, pc_params)
            pad_v = jnp.full((1,), pad_value, jnp.float32)
            from .ring import _pad_constants
            k1, k2, k3 = _pad_constants(pc, pc_params, pad_value)
            weights = (pad_v, w1, w2, w3, w4, centers[:, None])

            def bc(v, grid_hw, ch):
                return jnp.broadcast_to(
                    v, (kd - 1, bl) + grid_hw + (ch,)) + 0.0

            q_hist = jnp.full((kd - 1, bl) + grids[0] + (1,), pad_value,
                              jnp.float32)
            a1_hist = bc(k1, grids[1], kf)
            a2_hist = bc(k2, grids[2], kf)
            a3_hist = bc(k3, grids[3], kf)
            gptr0 = jnp.zeros((b_out, 1, bsub), jnp.int32)
            dummy_true = jnp.zeros((1, 1, 1, 128), jnp.int32)
            mode0 = jnp.zeros((1,), jnp.int32)

            def body(carry, th_c):
                q_hist, a1_hist, a2_hist, a3_hist, states, gptr = carry
                bias_rows = (
                    skew_bias(conv_lower(q_hist, lows[0]) + bs[0], 1),
                    skew_bias(conv_lower(a1_hist, lows[1]) + bs[1], 2),
                    skew_bias(conv_lower(a2_hist, lows[2]) + bs[2], 3),
                    skew_bias(conv_lower(a3_hist, lows[3]) + bs[3], 4))
                (syms, _f, _s, a1r, a2r, a3r, states, gptr) = fwd_dec(
                    weights, tables, bias_rows, dummy_true, streams,
                    states, gptr, mode0, thresh=th_c)
                sym_flat = jnp.take(
                    syms.reshape(b_out, T2_pad * CQB), inv_idx,
                    axis=1).reshape(bl, H, W)
                qp = jnp.take(centers, jnp.clip(sym_flat, 0, L - 1))
                q_plane = jnp.full((bl,) + grids[0], pad_value, jnp.float32)
                q_plane = q_plane.at[:, reach:reach + H,
                                     reach:reach + W].set(qp)[..., None]
                carry = (
                    jnp.concatenate([q_hist[1:], q_plane[None]], axis=0),
                    jnp.concatenate([a1_hist[1:],
                                     unskew_act(a1r, 1, grids[1])[None]], 0),
                    jnp.concatenate([a2_hist[1:],
                                     unskew_act(a2r, 2, grids[2])[None]], 0),
                    jnp.concatenate([a3_hist[1:],
                                     unskew_act(a3r, 3, grids[3])[None]], 0),
                    states, gptr)
                return carry, syms

            _, syms_all = jax.lax.scan(
                body, (q_hist, a1_hist, a2_hist, a3_hist, states_in, gptr0),
                _thresh_seq(thresh))
            syms_co = jnp.transpose(syms_all, (1, 0, 2, 3, 4)).reshape(
                b_out, C * T2_pad, 1, CQB)
            return unpack(syms_co)

        dec_full_cache = {}

        def decode_full_dev(pc_params, centers, words_u16, states_in,
                            thresh, rows_b):
            if rows_b not in dec_full_cache:
                dec_full_cache[rows_b] = self._shard_wrap(
                    functools.partial(decode_full_local, rows_b),
                    n_rep=2, n_batch=3, n_out=2)
            return dec_full_cache[rows_b](pc_params, centers, words_u16,
                                          states_in, thresh)

        @functools.partial(jax.jit, static_argnames=('rows_b',))
        def pad_stream(words_u16, rows_b):
            # (b_grp, bsub, rows_b, 128) u16 on the wire -> full-capacity
            # u32 buffer; only the used rows cross the (slow) host link.
            bg = words_u16.shape[0]
            full = jnp.zeros((bg, bsub * wrows, 128), jnp.uint32)
            for j in range(bsub):
                full = full.at[:, j * wrows:j * wrows + rows_b].set(
                    words_u16[:, j].astype(jnp.uint32))
            return full

        run_dev = self._shard_wrap(run, n_rep=3, n_batch=4, n_out=3)
        unpack_dev = self._shard_wrap(unpack, n_rep=0, n_batch=1, n_out=2)
        return _Fns(run_dev, rev_dev, take_fn, unpack_dev, pad_stream,
                    sched, bsub, b_out, wrows, BR,
                    encode_full_dev if split else None,
                    decode_full_dev if split else None,
                    lane_totals=lane_totals, x0_enc=x0_enc)

    # -- public API (mirrors PallasCoder) -------------------------------------

    def encode_batch_submit(self, pc_params, symbols, centers):
        host_symbols = None
        if not isinstance(symbols, jax.Array):
            host_symbols = np.asarray(symbols)
            symbols = jnp.asarray(host_symbols)
        b = symbols.shape[0]
        latent_shape = tuple(int(d) for d in symbols.shape[1:])
        return self._submit_with(pc_params, symbols, centers, latent_shape,
                                 host_symbols, b, bsub_max=None)

    def _submit_with(self, pc_params, symbols, centers, latent_shape,
                     host_symbols, b, bsub_max, x0=None):
        ks = self._run_fns(latent_shape, b, bsub_max)
        bsub, b_out, wrows, BR = ks.bsub, ks.b_out, ks.wrows, ks.BR
        x0_used = ks.x0_enc if x0 is None else x0
        centers_j = jnp.asarray(centers)
        syms_flat = symbols.reshape(b, -1)
        pred = self._rneed_pred.get((latent_shape, ks.wrows, ks.bsub), 0)
        if ks.encode_full is not None:
            # Split mode: the whole encode (scan + reverse rANS + theo +
            # CRC + row gather) is ONE dispatch.
            outs = ks.encode_full(pc_params, centers_j, syms_flat,
                                  rneed=pred, x0=x0_used)
        else:
            streams0 = jnp.zeros((b // bsub, bsub * wrows, 128), jnp.uint32)
            states0 = jnp.full((b // bsub, 1, BR), rans.RANS_L, jnp.uint32)
            thr0 = jnp.full((b // bsub, 1, BR),
                            np.iinfo(np.int32).max // 2, jnp.int32)
            _, fsel, ssel = ks.run_dev(pc_params, centers_j,
                                       jnp.ones((1,), jnp.int32), syms_flat,
                                       streams0, states0, thr0)
            outs = ks.rev_dev(fsel, ssel, syms_flat, rneed=pred, x0=x0_used)
        words, n_words, states, kwarm, theo, crcs = outs[:6]
        presel = outs[6] if pred else None
        # Early D2H: the tunnel streams the results down while the caller
        # keeps the device busy; the finish-time fetch finds them on host.
        for a in (theo, n_words, states, kwarm, crcs, presel):
            if a is not None and hasattr(a, 'copy_to_host_async'):
                a.copy_to_host_async()
        return (latent_shape, host_symbols, b, words, n_words, states, kwarm,
                theo, crcs, ks, pc_params, centers, symbols, presel, pred,
                x0_used)

    def encode_batch_finish(self, handle):
        from . import codec as codec_lib
        (latent_shape, host_symbols, b, words, n_words, states, kwarm, theo,
         crcs, ks, pc_params, centers, symbols, presel, pred,
         x0_used) = handle
        bsub, wrows = ks.bsub, ks.wrows
        # ONE fetch for the scalars AND the predicted stream rows (two
        # sequential device_gets cost two round trips on the remote link).
        fetched = jax.device_get(
            (theo, n_words, states, kwarm, crcs) +
            (() if presel is None else (presel,)))
        theo, n_words, states, kwarm, crcs = fetched[:5]
        presel_h = fetched[5] if presel is not None else None
        crcs = np.asarray(crcs).reshape(b)
        n_words = np.asarray(n_words).reshape(b)
        states = np.asarray(states).reshape(b, R)
        kwarm = np.asarray(kwarm).reshape(b, R)
        tail = x0_used < rans.RANS_L
        if tail and kwarm.size and int(kwarm.max()) > codec_lib.K_CAP:
            # Pathological: some lane needs > K_CAP warmup symbols to
            # reach RANS_L. Re-encode the whole batch with the classic
            # seed (mirrors the K=3 driver).
            print('*** planar encode: warmup exceeded K_CAP; re-encoding '
                  'with x0=RANS_L')
            return self.encode_batch_finish(self._submit_with(
                pc_params, symbols, centers, latent_shape, host_symbols, b,
                bsub_max=bsub, x0=rans.RANS_L))
        cap = wrows * 128
        if n_words.size and int(n_words.max()) > cap:
            # The bsub>=4 kernel caps the VMEM stream buffer at
            # ceil(log2 L)+1 bits/symbol; a pathological stream can
            # exceed it. Re-encode through bsub<=2 (full 16-bit/symbol
            # capacity, bitwise-identical streams — per-image math is
            # segment-local), mirroring the K=3 driver's fallback.
            if bsub > 2:
                print(f'*** planar encode: stream exceeded the bsub={bsub} '
                      f'word cap ({cap}); re-encoding at bsub<=2 '
                      '(full-capacity buffer)')
                return self.encode_batch_finish(self._submit_with(
                    pc_params, symbols, centers, latent_shape,
                    host_symbols, b, bsub_max=2))
            raise ValueError(
                f'planar stream exceeded the word cap ({cap}) even at '
                f'bsub={bsub} — the symbol volume is pathologically '
                'incompressible')
        wmax = int(n_words.max()) if n_words.size else 0
        rneed_act = min(wrows, max(1, -(-wmax // 128) + 1))
        if presel_h is not None and pred >= rneed_act:
            sel_h, rneed = presel_h, pred   # pre-dispatched at submit time
        else:
            rneed = rneed_act
            sel_h = jax.device_get(ks.take_fn(rneed)(words))
        # Predict the next batch's rows: actual need + 2 rows of headroom,
        # rounded (few distinct gather executables, fewer mispredicts).
        self._rneed_pred[(latent_shape, wrows, bsub)] = min(
            wrows, _round_up(rneed_act + 2, 4))
        host_words = np.asarray(sel_h).reshape(
            b, rneed * 128).astype(np.uint32)
        results = []
        for i in range(b):
            stream = host_words[i, :n_words[i]][::-1].astype(np.uint32)
            bitstream = codec_lib.serialize_stream(
                latent_shape, stream, states[i], int(crcs[i]),
                impl_id=codec_lib.IMPL_PLANAR, prec=0,
                k=kwarm[i] if tail else None)
            results.append(codec_lib.EncodeResult(
                bitstream=bitstream, num_bits=len(bitstream) * 8,
                theoretical_bits=float(theo[i]),
                symbols=None if host_symbols is None else host_symbols[i]))
        return tuple(results)

    def encode_batch(self, pc_params, symbols, centers):
        return self.encode_batch_finish(
            self.encode_batch_submit(pc_params, symbols, centers))

    def decode_batch_submit(self, pc_params, bitstreams, centers):
        from . import codec as codec_lib
        parsed = [codec_lib.deserialize_stream(bs) for bs in bitstreams]
        latent_shape = parsed[0][0]
        assert all(p[0] == latent_shape for p in parsed), 'mixed shapes'
        b = len(parsed)
        ks = self._run_fns(latent_shape, b)
        bsub, b_out_g, wrows, BR = ks.bsub, ks.b_out, ks.wrows, ks.BR
        n = int(np.prod(latent_shape))
        nmax = max([1] + [len(p[1]) for p in parsed])
        if nmax > wrows * 128 and bsub > 2:
            # Stream longer than the reduced bsub>=4 buffer (e.g. from
            # the encode-side fallback): route to the full-capacity
            # bsub<=2 kernels — bitwise-identical math.
            ks = self._run_fns(latent_shape, b, bsub_max=2)
            bsub, b_out_g, wrows, BR = ks.bsub, ks.b_out, ks.wrows, ks.BR
        if nmax > wrows * 128:
            raise ValueError(
                f'planar stream length {nmax} exceeds the bsub={bsub} '
                f'word cap ({wrows * 128})')
        # Bucketed used-row count: bounds recompiles of pad_stream while
        # keeping the host-link transfer proportional to the real streams.
        rows_b = min(wrows, _round_up(-(-nmax // 128) + 1, 8))
        packed = np.zeros((b // bsub, bsub, rows_b, 128), np.uint16)
        states = np.zeros((b // bsub, 1, bsub, R), np.uint32)
        # Tail-packed (x0=1) streams: no pull in each lane's last k
        # symbols (thresh = lane_totals - k); legacy streams get a huge
        # threshold that never binds. Mixed batches are fine — the
        # threshold is per lane.
        thresh = np.full((b // bsub, 1, bsub, R),
                         np.iinfo(np.int32).max // 2, np.int32)
        for i, (_, stream_words, st, _crc, k) in enumerate(parsed):
            assert len(st) == R, (len(st), R)
            g, j = divmod(i, bsub)
            states[g, 0, j, :] = st
            if k is not None:
                thresh[g, 0, j, :] = ks.lane_totals - k.astype(np.int32)
            flat = packed[g, j].reshape(-1)
            flat[:len(stream_words)] = stream_words
        states_dev = jnp.asarray(states.reshape(b // bsub, 1, bsub * R))
        thresh_dev = jnp.asarray(thresh.reshape(b // bsub, 1, bsub * R))
        if ks.decode_full is not None:
            # Split mode: stream padding + decode scan + unpack + CRC in
            # ONE dispatch (and no dummy teacher volume to materialize).
            out, crcs = ks.decode_full(pc_params, jnp.asarray(centers),
                                       jnp.asarray(packed), states_dev,
                                       thresh_dev, rows_b=rows_b)
        else:
            dummy_syms = jnp.zeros((b, n), jnp.int8)
            streams_dev = ks.pad_stream(jnp.asarray(packed), rows_b=rows_b)
            syms_co, _, _ = ks.run_dev(
                pc_params, jnp.asarray(centers), jnp.zeros((1,), jnp.int32),
                dummy_syms, streams_dev, states_dev, thresh_dev)
            out, crcs = ks.unpack_dev(syms_co)
        if hasattr(crcs, 'copy_to_host_async'):
            crcs.copy_to_host_async()   # stream the CRCs down early
        return (latent_shape, parsed, out, crcs)

    def decode_batch_finish(self, handle, verify: bool = True,
                            device_out: bool = False):
        latent_shape, parsed, packed_syms, crcs = handle
        b = len(parsed)
        if verify:
            crcs_h = np.asarray(jax.device_get(crcs)).reshape(b)
            for i in range(b):
                if int(crcs_h[i]) != parsed[i][3]:
                    raise ValueError(
                        f'decode CRC mismatch for image {i}: corrupt '
                        'stream, or decode ran with a different executable '
                        'than encode')
        if device_out:
            return packed_syms.reshape((b,) + latent_shape)
        out = np.asarray(jax.device_get(packed_syms), np.int32)
        return out.reshape((b,) + latent_shape)

    def decode_batch(self, pc_params, bitstreams, centers, verify=True,
                     device_out=False):
        return self.decode_batch_finish(
            self.decode_batch_submit(pc_params, bitstreams, centers),
            verify=verify, device_out=device_out)


class _Fns:
    def __init__(self, run_dev, rev_dev, take_fn, unpack_dev, pad_stream,
                 sched, bsub, b_out, wrows, BR,
                 encode_full=None, decode_full=None,
                 lane_totals=None, x0_enc=rans.RANS_L):
        self.run_dev = run_dev
        self.rev_dev = rev_dev
        self.take_fn = take_fn
        self.unpack_dev = unpack_dev
        self.pad_stream = pad_stream
        self.sched = sched
        self.bsub = bsub
        self.b_out = b_out
        self.wrows = wrows
        self.BR = BR
        self.encode_full = encode_full     # split mode: ONE-dispatch paths
        self.decode_full = decode_full
        self.lane_totals = lane_totals   # (R,) active symbols per rANS lane
        self.x0_enc = x0_enc             # encoder seed (1 = tail packing)
