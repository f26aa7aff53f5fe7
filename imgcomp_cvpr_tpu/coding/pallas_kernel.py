"""Monolithic Pallas wavefront codec kernel.

The XLA ring codec (coding/ring.py) executes one wavefront step as ~40
XLA ops; at Kodak size the scan is op-dispatch-bound (~55-65 us/step,
MXU nearly idle). This module moves the ENTIRE scan into one Pallas
kernel: the packed (d, j)-banded activation rings live in VMEM for all
T steps, the folded conv weights stay resident, each step is four MXU
matmuls plus an in-register interleaved-rANS update, and only the
per-step schedule scalars/masks and the coded streams touch HBM.

Geometry (kernel_size=3 / context 9, same algebra as coding/ring.py):
every cache cell is indexed by v = 25 d + 5 h + w; layer l writes one
v-row per step (v = t + c_l, c_l = 31 (4 - l)); a row's valid cells
form a (DW, J) packed band with rel_d = d - d_lo(v), j = h + 5 d - j0(v);
tap (dz, dy, dx) of the next layer reads the band at a per-step scalar
offset, from ring slot (t - 31 + 25 dz + 5 dy + dx) mod 38. All shifts
are precomputed into a per-step int32 table streamed through SMEM.

Entropy coding: interleaved rANS with R = 16 persistent lanes
(coding/rans.py documents the scheme; fewer lanes than the XLA ring
impl's 64 => ~4x less stream-flush overhead, hitting the <=0.5%
real-bpp budget). Lanes are the cells of the step's packed logits
plane in row-major order, processed in S = P_pad / R sub-iterations;
sub-iterations with no active cell are skipped via precomputed flags
(the reverse encoder reads the same flags, so encode and decode agree).
All rANS vectors are sublane-major (R, 1); cross-lane moves (stream
word distribution, prefix ranks) are one-hot matvecs run at
precision=HIGHEST so 16-bit integer values survive the MXU exactly.

Bit-exactness contract (same as coding/codec.py): encode (teacher-
forced) and decode run ONE kernel with a traced mode flag, so the
float logits -> integer CDF mapping is identical in both directions.
Because the batch index never enters the step math, streams are also
decodable at any batch size (unlike the XLA impls).

Replaces the reference's per-symbol sess.run + Python arithmetic coder
(ref: bit_counter.py:103-163, probclass.py:425-482, ~550 s/image).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rans
from . import wavefront

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WINDOW = [(dz, dy, dx) for dz in range(2) for dy in range(3) for dx in range(3)]
_OFFS = [25 * dz + 5 * dy + dx for dz, dy, dx in _WINDOW]
VR = 38                    # ring slots: window offsets span [-31, +6]
_C = (124, 93, 62, 31, 0)  # v-row constant per level (q, L1..L4)
R = 16                     # persistent rANS lanes
Q_CH = 8                   # lane-dim replication of the scalar q ring

_HIGH = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class PallasSchedule(NamedTuple):
    latent_shape: Tuple[int, int, int]
    T: int
    P: int                       # DW4 * J4 (packed logits plane cells)
    P_pad: int                   # P rounded up to a multiple of 128
    S: int                       # P_pad // R sub-iterations per step
    DW: Tuple[int, ...]          # packed band extents per level 0..4
    J: Tuple[int, ...]
    store: Tuple[Tuple[int, int], ...]   # ring row extents per level 0..3
    table: np.ndarray            # (T, 1, NS) int32 per-step scalars
    active: np.ndarray           # (T, P_pad, 1) int32 latent-cell mask
    active2d: np.ndarray         # (T, DW4, J4) int32 (same mask, plane layout)
    idx_map: np.ndarray          # (T, P_pad) int32 -> flat latent idx (or n)
    wcap: int                    # stream word capacity (n + slack)


def _row_maps(grid):
    d_grid, h_grid, w_grid = grid
    u_max = 5 * (h_grid - 1) + w_grid - 1

    def j0(v):
        return np.maximum(0, -(-(v - (w_grid - 1)) // 5))

    def d_lo(v):
        return np.clip(-(-(v - u_max) // 25), 0, d_grid - 1)

    return j0, d_lo


def _grids(latent_shape, p=4):
    C, H, W = latent_shape
    g0 = (C + p, H + 2 * p, W + 2 * p)
    g1 = (g0[0] - 1, g0[1] - 2, g0[2] - 2)
    g2 = (g1[0] - 1, g1[1] - 2, g1[2] - 2)
    g3 = (g2[0] - 1, g2[1] - 2, g2[2] - 2)
    return (g0, g1, g2, g3, (C, H, W))


@functools.lru_cache(maxsize=8)
def build_pallas_schedule(latent_shape: Tuple[int, int, int]) -> PallasSchedule:
    C, H, W = latent_shape
    p = 4
    grids = _grids(latent_shape, p)
    T = 25 * (C - 1) + 5 * (H - 1) + (W - 1) + 1   # linear wavefront steps
    t_arr = np.arange(T)

    # Packed band extents per level.
    DW, J = [], []
    for grid, c in zip(grids, _C):
        j0f, dlof = _row_maps(grid)
        d_grid, h_grid, w_grid = grid
        dw = jmax = 1
        v = t_arr[:, None] + c
        d_idx = np.arange(d_grid)[None, :]
        u = v - 25 * d_idx
        ok = (u >= 0) & (u <= 5 * (h_grid - 1) + w_grid - 1)
        if ok.any():
            rel_d = d_idx - dlof(v)
            h_hi = np.minimum(h_grid - 1, np.maximum(u, 0) // 5)
            jj = h_hi + 5 * d_idx - j0f(v)
            dw = int(rel_d[ok].max()) + 1
            jmax = int(jj[ok].max()) + 1
        DW.append(dw)
        J.append(jmax)

    # Per-layer tap shifts (T, 18) for layers 1..4.
    d_shift, j_shift = [], []
    for li in range(1, 5):
        j0o, dloo = _row_maps(grids[li])
        j0i, dloi = _row_maps(grids[li - 1])
        v_out = t_arr + _C[li]
        ds = np.zeros((T, 18), np.int32)
        js = np.zeros((T, 18), np.int32)
        for o, ((dz, dy, dx), off) in enumerate(zip(_WINDOW, _OFFS)):
            v_in = v_out + off
            ds[:, o] = dz + dloo(v_out) - dloi(v_in)
            js[:, o] = dy + 5 * dz + j0o(v_out) - j0i(v_in)
        assert ds.min() >= 0 and js.min() >= 0, (li, ds.min(), js.min())
        d_shift.append(ds)
        j_shift.append(js)

    # L3 residual skip reads THIS step's y1 plane at a scalar offset.
    j0_1, dlo_1 = _row_maps(grids[1])
    j0_3, dlo_3 = _row_maps(grids[3])
    v1 = t_arr + _C[1]
    v3 = t_arr + _C[3]
    sk_d = (dlo_3(v3) + 2 - dlo_1(v1)).astype(np.int32)
    sk_j = (j0_3(v3) + 12 - j0_1(v1)).astype(np.int32)
    assert sk_d.min() >= 0 and sk_j.min() >= 0
    DW[1] = max(DW[1], int(sk_d.max()) + DW[3])
    J[1] = max(J[1], int(sk_j.max()) + J[3])

    # Q-plane write: the step's (DW4, J4) symbol plane lands in the level-0
    # row at a scalar offset (d0 = d + p, h0 = h + p => j shifts by 6 p).
    j0_0, dlo_0 = _row_maps(grids[0])
    j0_4, dlo_4 = _row_maps(grids[4])
    v0 = t_arr + _C[0]
    q_sd = (dlo_4(t_arr) + p - dlo_0(v0)).astype(np.int32)
    q_sj = (j0_4(t_arr) + 6 * p - j0_0(v0)).astype(np.int32)
    assert q_sd.min() >= 0 and q_sj.min() >= 0, (q_sd.min(), q_sj.min())

    # Ring storage extents: own band plus whatever the consumers slice.
    store = []
    for li in range(4):
        dws = max(DW[li], int(d_shift[li].max()) + DW[li + 1])
        jss = max(J[li], int(j_shift[li].max()) + J[li + 1])
        if li == 0:
            dws = max(dws, int(q_sd.max()) + DW[4])
            jss = max(jss, int(q_sj.max()) + J[4])
        store.append((dws, jss))
    store = tuple(store)

    # Logits-plane cell -> latent symbol mapping + active mask.
    P = DW[4] * J[4]
    P_pad = _round_up(max(P, 128), 128)
    S = P_pad // R
    rel_d = np.arange(DW[4])[None, :, None]
    jj = np.arange(J[4])[None, None, :]
    d = dlo_4(t_arr)[:, None, None] + rel_d
    h = jj + j0_4(t_arr)[:, None, None] - 5 * d
    w = t_arr[:, None, None] - 25 * d - 5 * h
    valid = ((d >= 0) & (d < C) & (h >= 0) & (h < H) & (w >= 0) & (w < W))
    n = C * H * W
    flat = np.where(valid, (d * H + np.maximum(h, 0)) * W + np.maximum(w, 0), n)
    assert int(valid.sum()) == n, (valid.sum(), n)
    on = np.sort(flat[valid].ravel())
    assert (on == np.arange(n)).all(), 'idx_map is not a permutation'

    active2d = valid.astype(np.int32)
    active = np.zeros((T, P_pad, 1), np.int32)
    active[:, :P, 0] = valid.reshape(T, P)
    idx_map = np.full((T, P_pad), n, np.int32)
    idx_map[:, :P] = flat.reshape(T, P)

    # Sub-iteration any-active flags.
    subit = active[:, :, 0].reshape(T, S, R).any(axis=2).astype(np.int32)

    # Per-step scalar table.
    NS = 148 + S
    table = np.zeros((T, 1, NS), np.int32)
    for li in range(4):
        table[:, 0, 36 * li:36 * li + 18] = d_shift[li]
        table[:, 0, 36 * li + 18:36 * li + 36] = j_shift[li]
    table[:, 0, 144] = sk_d
    table[:, 0, 145] = sk_j
    table[:, 0, 146] = q_sd
    table[:, 0, 147] = q_sj
    table[:, 0, 148:148 + S] = subit

    wcap = _round_up(n + 2 * R, 128)
    return PallasSchedule(latent_shape=latent_shape, T=T, P=P, P_pad=P_pad,
                          S=S, DW=tuple(DW), J=tuple(J), store=store,
                          table=table, active=active, active2d=active2d,
                          idx_map=idx_map, wcap=wcap)


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------

def _excl_rank(v_i32):
    """Exclusive prefix sum over sublanes: (R, 1) -> (R, 1), exact i32
    (strictly-lower-triangular ones matvec at HIGHEST precision). The
    triangular matrix is built from iota in-kernel (kernels cannot capture
    array constants)."""
    m = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
         < jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)).astype(jnp.float32)
    out = jax.lax.dot_general(m, v_i32.astype(jnp.float32),
                              (((1,), (0,)), ((), ())), precision=_HIGH)
    return out.astype(jnp.int32)


def _onehot_matvec(oh_bool, v_i32):
    """(R, R) one-hot x (R, 1) i32 -> (R, 1), exact through the MXU."""
    out = jax.lax.dot_general(oh_bool.astype(jnp.float32),
                              v_i32.astype(jnp.float32),
                              (((1,), (0,)), ((), ())), precision=_HIGH)
    return out.astype(jnp.int32)


def _select_rows(onehot_rl, table_rl):
    """(R, L) one-hot x (R, L) i32 table -> (R, 1) selected values."""
    return jnp.sum(jnp.where(onehot_rl, table_rl, 0), axis=1, keepdims=True)


def _quantize_cdf_kernel(logits, L):
    """In-kernel twin of rans.quantize_cdf: (P_pad, L) f32 logits ->
    (freq, cdf_low) (P_pad, L) i32 with row sums == SCALE."""
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    scaled = jnp.floor(probs * np.float32(rans.SCALE - L)).astype(jnp.int32) + 1
    deficit = rans.SCALE - jnp.sum(scaled, axis=1, keepdims=True)
    pmax = jnp.max(probs, axis=1, keepdims=True)
    lidx = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 1)
    am = jnp.min(jnp.where(probs == pmax, lidx, L), axis=1, keepdims=True)
    freq = scaled + jnp.where(lidx == am, deficit, 0)
    # cdf_low[p, l] = sum_{k < l} freq[p, k]  (3D mask-reduce, exact i32)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, L, L), 2)
            < jax.lax.broadcasted_iota(jnp.int32, (1, L, L), 1))
    cdf = jnp.sum(jnp.where(mask, freq[:, None, :], 0), axis=2)
    return freq, cdf


# ---------------------------------------------------------------------------
# Forward kernel (teacher-forced encode scan / decode scan — one executable)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def make_forward(latent_shape: Tuple[int, int, int], kf: int, L: int, B: int,
                 interpret: bool = False):
    """Returns (fn, sched). fn(params_pack, tables_pack, true_syms, streams,
    init_states, mode) -> (syms, freq_sel, start_sel), all (B, T, P_pad, 1)."""
    sched = build_pallas_schedule(latent_shape)
    T, P, P_pad, S = sched.T, sched.P, sched.P_pad, sched.S
    DW, J, store = sched.DW, sched.J, sched.store
    NS = sched.table.shape[-1]
    wcap = sched.wcap
    cells = [None] + [DW[i] * J[i] for i in range(1, 5)]
    X_ROWS = _round_up(max(cells[2], cells[3], P_pad), 8)
    K1 = 18 * Q_CH
    K = 18 * kf
    X_COLS = max(K, K1)
    assert L >= 2

    def kernel(table_ref, mode_ref,
               pad_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               w4_ref, b4_ref, k1_ref, k2_ref, k3_ref, centers_ref,
               act_ref, act2d_ref, true_ref, stream_ref, inst_ref,
               sym_out, fsel_out, ssel_out,
               r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s):
        t = pl.program_id(1)
        slot = jax.lax.rem(t, VR)

        @pl.when(t == 0)
        def _init():
            r0[:] = jnp.full(r0.shape, pad_ref[0], jnp.float32)
            r1[:] = jnp.broadcast_to(k1_ref[:][None, None], r1.shape)
            r2[:] = jnp.broadcast_to(k2_ref[:][None, None], r2.shape)
            r3[:] = jnp.broadcast_to(k3_ref[:][None, None], r3.shape)
            states_s[:] = inst_ref[0]
            gptr_s[0] = 0

        def tap_rows():
            return [jax.lax.rem(t + 2 * VR - 31 + off, VR) for off in _OFFS]

        rows = tap_rows()

        def fill_X(ring, li, d_out, j_out, ch):
            base = 36 * (li - 1)
            for o in range(18):
                ds = table_ref[0, 0, base + o]
                js = table_ref[0, 0, base + 18 + o]
                tap = ring[rows[o], pl.ds(ds, d_out), pl.ds(js, j_out), :]
                X[0:d_out * j_out, o * ch:(o + 1) * ch] = tap.reshape(
                    d_out * j_out, ch)

        # Layer 1 (input ring has Q_CH replicated channels).
        fill_X(r0, 1, DW[1], J[1], Q_CH)
        y1 = jax.nn.relu(
            jnp.dot(X[0:cells[1], 0:K1], w1_ref[:],
                    preferred_element_type=jnp.float32) + b1_ref[:])
        y1s[:] = y1.reshape(DW[1], J[1], kf)
        r1[slot, 0:DW[1], 0:J[1], :] = y1s[:]

        # Layer 2.
        fill_X(r1, 2, DW[2], J[2], kf)
        y2 = jax.nn.relu(
            jnp.dot(X[0:cells[2], 0:K], w2_ref[:],
                    preferred_element_type=jnp.float32) + b2_ref[:])
        r2[slot, 0:DW[2], 0:J[2], :] = y2.reshape(DW[2], J[2], kf)

        # Layer 3 (+ residual skip from this step's y1, no relu).
        fill_X(r2, 3, DW[3], J[3], kf)
        skip = y1s[pl.ds(table_ref[0, 0, 144], DW[3]),
                   pl.ds(table_ref[0, 0, 145], J[3]), :]
        y3 = (jnp.dot(X[0:cells[3], 0:K], w3_ref[:],
                      preferred_element_type=jnp.float32)
              + b3_ref[:] + skip.reshape(cells[3], kf))
        r3[slot, 0:DW[3], 0:J[3], :] = y3.reshape(DW[3], J[3], kf)

        # Layer 4: logits over the padded plane (rows >= cells[4] are junk,
        # masked by `active`). The reference ReLUs its output layer too
        # (ref: probclass.py:220,227-233).
        fill_X(r3, 4, DW[4], J[4], kf)
        logits = jax.nn.relu(
            jnp.dot(X[0:P_pad, 0:K], w4_ref[:],
                    preferred_element_type=jnp.float32) + b4_ref[:])
        freq, cdf = _quantize_cdf_kernel(logits, L)

        mode = mode_ref[0]
        centers_row = centers_ref[:]                             # (1, L)
        lidx_rl = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

        for si in range(S):
            base = si * R

            @pl.when(table_ref[0, 0, 148 + si] != 0)
            def _sub(base=base):
                fq = freq[base:base + R, :]                     # (R, L) i32
                cl = cdf[base:base + R, :]
                a = act_ref[0, pl.ds(base, R), :] != 0          # (R, 1)
                st = states_s[:]                                # (R, 1) u32
                slot_u = st & jnp.uint32(rans.SCALE - 1)
                slot_i = slot_u.astype(jnp.int32)
                symd = jnp.sum((cl <= slot_i).astype(jnp.int32),
                               axis=1, keepdims=True) - 1       # (R, 1)
                ohd = lidx_rl == symd
                fd = _select_rows(ohd, fq)
                sd = _select_rows(ohd, cl)
                x = (fd.astype(jnp.uint32) * (st >> rans.SCALE_BITS)
                     + slot_u - sd.astype(jnp.uint32))
                need = a & (x < jnp.uint32(rans.RANS_L))
                ni = need.astype(jnp.int32)
                rank = _excl_rank(ni)                           # exclusive
                total = jnp.sum(ni)
                gp = gptr_s[0]
                win = stream_ref[0, pl.ds(gp, R), :].astype(jnp.int32)
                woh = (rank == jax.lax.broadcasted_iota(
                    jnp.int32, (R, R), 1)) & need
                wsel = _onehot_matvec(woh, win)
                x = jnp.where(need,
                              (x << rans.WORD_BITS) | wsel.astype(jnp.uint32),
                              x)
                states_s[:] = jnp.where(a, x, st)
                gptr_s[0] = gp + total

                sym_true = true_ref[0, 0, pl.ds(base, R), :]    # (R, 1) i32
                sym = jnp.where(mode == 1, sym_true, symd)
                sym = jnp.where(a, sym, 0)
                ohs = lidx_rl == sym
                fsel = _select_rows(ohs, fq)
                ssel = _select_rows(ohs, cl)
                vals[pl.ds(base, R), :] = jnp.sum(
                    jnp.where(ohs, centers_row, 0.0), axis=1, keepdims=True)
                sym_out[0, 0, pl.ds(base, R), :] = sym
                fsel_out[0, 0, pl.ds(base, R), :] = fsel.astype(jnp.uint32)
                ssel_out[0, 0, pl.ds(base, R), :] = ssel.astype(jnp.uint32)

            @pl.when(table_ref[0, 0, 148 + si] == 0)
            def _skip(base=base):
                zero = jnp.zeros((R, 1), jnp.int32)
                sym_out[0, 0, pl.ds(base, R), :] = zero
                fsel_out[0, 0, pl.ds(base, R), :] = zero.astype(jnp.uint32)
                ssel_out[0, 0, pl.ds(base, R), :] = zero.astype(jnp.uint32)
                vals[pl.ds(base, R), :] = jnp.zeros((R, 1), jnp.float32)

        # Q-row write: full pad fill, then the latent rectangle.
        pad = pad_ref[0]
        r0[slot] = jnp.full((store[0][0], store[0][1], Q_CH), 1.0,
                            jnp.float32) * pad
        vals2d = vals[0:P, :].reshape(DW[4], J[4])
        rect = jnp.where(act2d_ref[0] != 0, vals2d, pad)
        r0[slot, pl.ds(table_ref[0, 0, 146], DW[4]),
           pl.ds(table_ref[0, 0, 147], J[4]), :] = jnp.broadcast_to(
               rect[:, :, None], (DW[4], J[4], Q_CH))

    grid = (B, T)
    step_map3 = lambda b, t: (t, 0, 0)
    step_map4 = lambda b, t: (b, t, 0, 0)
    const2 = lambda b, t: (0, 0)
    in_specs = [
        pl.BlockSpec((1, 1, NS), step_map3, memory_space=pltpu.SMEM),  # table
        pl.BlockSpec(memory_space=pltpu.SMEM),                         # mode
        pl.BlockSpec(memory_space=pltpu.SMEM),                         # pad
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # w1
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # b1
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # w2
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # b2
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # w3
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # b3
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # w4
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # b4
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # k1
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # k2
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # k3
        pl.BlockSpec(memory_space=pltpu.VMEM),                         # centers
        pl.BlockSpec((1, P_pad, 1), lambda b, t: (t, 0, 0)),           # active
        pl.BlockSpec((1, DW[4], J[4]), lambda b, t: (t, 0, 0)),        # act2d
        pl.BlockSpec((1, 1, P_pad, 1), step_map4),                     # true
        pl.BlockSpec((1, wcap, 1), lambda b, t: (b, 0, 0)),            # stream
        pl.BlockSpec((1, R, 1), lambda b, t: (b, 0, 0)),               # states
    ]
    out_specs = tuple(pl.BlockSpec((1, 1, P_pad, 1), step_map4)
                      for _ in range(3))
    out_shape = (jax.ShapeDtypeStruct((B, T, P_pad, 1), jnp.int32),
                 jax.ShapeDtypeStruct((B, T, P_pad, 1), jnp.uint32),
                 jax.ShapeDtypeStruct((B, T, P_pad, 1), jnp.uint32))
    scratch = [
        pltpu.VMEM((VR, store[0][0], store[0][1], Q_CH), jnp.float32),  # r0
        pltpu.VMEM((VR, store[1][0], store[1][1], kf), jnp.float32),    # r1
        pltpu.VMEM((VR, store[2][0], store[2][1], kf), jnp.float32),    # r2
        pltpu.VMEM((VR, store[3][0], store[3][1], kf), jnp.float32),    # r3
        pltpu.VMEM((X_ROWS, X_COLS), jnp.float32),                      # X
        pltpu.VMEM((DW[1], J[1], kf), jnp.float32),                     # y1s
        pltpu.VMEM((P_pad, 1), jnp.float32),                            # vals
        pltpu.VMEM((R, 1), jnp.uint32),                                 # states
        pltpu.SMEM((1,), jnp.int32),                                    # gptr
    ]

    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))

    def fn(weights, tables, true_syms, streams, init_states, mode):
        (pad_v, w1, b1, w2, b2, w3, b3, w4, b4, k1, k2, k3, centers) = weights
        table, active, active2d = tables
        return call(table, mode, pad_v, w1, b1, w2, b2, w3, b3, w4, b4,
                    k1, k2, k3, centers, active, active2d, true_syms,
                    streams, init_states)

    return fn, sched


# ---------------------------------------------------------------------------
# Reverse interleaved-rANS encoder kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def make_reverse(latent_shape: Tuple[int, int, int], B: int,
                 interpret: bool = False):
    """fn(tables, freq_sel, start_sel) -> (words (B, wcap, 1) u32 in emission
    order, n_words (B, 1, 1) i32, states (B, 1, R) u32). Decode-order stream
    is words[b, :n][::-1]."""
    sched = build_pallas_schedule(latent_shape)
    T, P_pad, S, NS, wcap = (sched.T, sched.P_pad, sched.S,
                             sched.table.shape[-1], sched.wcap)

    def kernel(table_ref, act_ref, fsel_ref, ssel_ref,
               words_out, nw_out, st_out, states_s, gw_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            states_s[:] = jnp.full((R, 1), rans.RANS_L, jnp.uint32)
            gw_s[0] = 0

        for si in range(S - 1, -1, -1):
            base = si * R

            @pl.when(table_ref[0, 0, 148 + si] != 0)
            def _sub(base=base):
                f = jnp.maximum(fsel_ref[0, 0, pl.ds(base, R), :],
                                jnp.uint32(1))                   # (R, 1)
                sv = ssel_ref[0, 0, pl.ds(base, R), :]
                a = act_ref[0, pl.ds(base, R), :] != 0
                st = states_s[:]
                emit = a & (st >= (f << rans.WORD_BITS))
                word = (st & jnp.uint32(rans.WORD_MASK)).astype(jnp.int32)
                ei = emit.astype(jnp.int32)
                fwd = _excl_rank(ei)                             # exclusive
                total = jnp.sum(ei)
                # Emission order: descending lane rank, so the final global
                # reversal restores decode-read order (see coding/rans.py).
                pos = total - 1 - fwd                            # (R, 1)
                ooh = ((pos == jax.lax.broadcasted_iota(jnp.int32, (R, R), 1))
                       & emit)
                win = jax.lax.dot_general(
                    ooh.astype(jnp.float32), word.astype(jnp.float32),
                    (((0,), (0,)), ((), ())), precision=_HIGH).astype(jnp.int32)
                gw = gw_s[0]
                words_out[0, pl.ds(gw, R), :] = win.astype(jnp.uint32)
                st = jnp.where(emit, st >> rans.WORD_BITS, st)
                xn = (((st // f) << rans.SCALE_BITS) + (st % f) + sv)
                states_s[:] = jnp.where(a, xn, st)
                gw_s[0] = gw + total

        nw_out[:] = jnp.zeros((1, 1, 1), jnp.int32) + gw_s[0]
        st_out[0] = states_s[:]

    grid = (B, T)
    in_specs = [
        pl.BlockSpec((1, 1, NS), lambda b, t: (T - 1 - t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, P_pad, 1), lambda b, t: (T - 1 - t, 0, 0)),
        pl.BlockSpec((1, 1, P_pad, 1), lambda b, t: (b, T - 1 - t, 0, 0)),
        pl.BlockSpec((1, 1, P_pad, 1), lambda b, t: (b, T - 1 - t, 0, 0)),
    ]
    out_specs = (pl.BlockSpec((1, wcap, 1), lambda b, t: (b, 0, 0)),
                 pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0)),
                 pl.BlockSpec((1, R, 1), lambda b, t: (b, 0, 0)))
    out_shape = (jax.ShapeDtypeStruct((B, wcap, 1), jnp.uint32),
                 jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
                 jax.ShapeDtypeStruct((B, R, 1), jnp.uint32))
    scratch = [pltpu.VMEM((R, 1), jnp.uint32), pltpu.SMEM((1,), jnp.int32)]

    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))

    def fn(tables, freq_sel, start_sel):
        table, active, _ = tables
        return call(table, active, freq_sel, start_sel)

    return fn, sched
