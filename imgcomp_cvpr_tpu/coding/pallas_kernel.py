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
offset, from ring slot (t - 31 + 25 dz + 5 dy + dx) mod 38.

TPU layout: every band plane is stored TRANSPOSED as (channels, cells)
with cells = rel_d * J_STORE + j in the LANE dimension, one global row
stride J_STORE for all levels. Consequences that make this the right
shape for the hardware (discovered the hard way — the (d, j, ch) layout
tile-pads ch=24 up to 128 lanes and OOMs VMEM by 3x):
  - rings are dense (sublane dim = channels, multiple of 8; lane dim =
    cells, rounded to 128): ~7 MB total at Kodak size;
  - a tap's (ds, dj) band shift collapses to ONE lane offset
    ds * J_STORE + dj => one dynamic slice per tap, no reshapes;
  - each layer is one (18ch, cout) x (18ch, cells) MXU matmul whose
    output IS the ring row — written back verbatim;
  - the q-plane write is one lane-shifted masked store.

Entropy coding: interleaved rANS with R = 16 persistent lanes
(coding/rans.py documents the scheme; fewer lanes than the XLA ring
impl's 64 => ~4x less stream-flush overhead, hitting the <=0.5%
real-bpp budget). rANS lanes are the cells of the logits plane in
lane-major order, processed in S = P_pad / R sub-iterations;
sub-iterations with no active cell are skipped via precomputed flags
(the reverse encoder reads the same flags, so the two stay in step).
Stream words live in a dense (rows, 128) buffer; the <=R words a
sub-iteration moves are gathered/scattered with one-hot matvecs at
precision=HIGHEST (exact for 16-bit integers), so no dynamic
lane-granularity memory ops exist anywhere in the kernel.

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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WINDOW = [(dz, dy, dx) for dz in range(2) for dy in range(3) for dx in range(3)]
_OFFS = [25 * dz + 5 * dy + dx for dz, dy, dx in _WINDOW]
VR = 38                    # ring slots: window offsets span [-31, +6]
_C = (124, 93, 62, 31, 0)  # v-row constant per level (q, L1..L4)
R = 32                     # persistent rANS lanes
K_STEPS = 8                # wavefront steps per grid iteration (pipeline amortization)
Q_CH = 8                   # sublane replication of the scalar q ring

_HIGH = jax.lax.Precision.HIGHEST

# Debug ablation knobs for perf triage (set before make_forward/make_reverse;
# affect kernel structure only — never used in production paths).
_ABLATE = 'full'
_ABLATE_REV = 'full'


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class PallasSchedule(NamedTuple):
    latent_shape: Tuple[int, int, int]
    T: int
    J_STORE: int                 # global row stride of all band planes
    P: int                       # DW4 * J_STORE (logits plane lanes, unpadded)
    P_pad: int                   # P rounded up to a multiple of 128
    S: int                       # P_pad // R sub-iterations per step
    DW: Tuple[int, ...]          # packed band d-extents per level 0..4
    J: Tuple[int, ...]           # packed band j-extents per level 0..4
    lanes: Tuple[int, ...]       # ring lane extents per level 0..3
    plane: Tuple[int, ...]       # computed plane lanes per level 1..4 (idx 0 unused)
    table: np.ndarray            # (T, 1, NS) int32 per-step scalars
    active: np.ndarray           # (T, 1, P_pad) int32 latent-cell mask
    idx_map: np.ndarray          # (T, P_pad) int32 -> flat latent idx (or n)
    chunk_offs: Tuple[int, ...]  # static lane offsets of rANS sub-iterations
    wcap: int                    # stream word capacity (multiple of 128)


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


# Table layout (int32 per step): 18 lane shifts per layer 1..4, then the
# L3-skip lane shift, the q-write lane shift, then S sub-iteration
# any-active flags.
_TBL_SKIP = 72
_TBL_Q = 73
_TBL_SUBIT = 74


def _unmasked_taps(first: bool):
    # Taps whose folded weights are not entirely zero (the last kernel
    # depth slice is causally masked, ref: probclass.py:150-176); rolls
    # for fully-masked taps are skipped — their X columns stay stale and
    # multiply by exact zeros.
    from ..models.probclass import spatial_mask
    m = spatial_mask(3, first)
    return [o for o, (dz, dy, dx) in enumerate(_WINDOW)
            if dz == 0 or m[dy, dx] > 0]


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
        ds = np.zeros((T, 18), np.int64)
        js = np.zeros((T, 18), np.int64)
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
    sk_d = dlo_3(t_arr + _C[3]) + 2 - dlo_1(t_arr + _C[1])
    sk_j = j0_3(t_arr + _C[3]) + 12 - j0_1(t_arr + _C[1])
    assert sk_d.min() >= 0 and sk_j.min() >= 0
    DW[1] = max(DW[1], int(sk_d.max()) + DW[3])
    J[1] = max(J[1], int(sk_j.max()) + J[3])

    # Q-plane write: the step's symbol plane lands in the level-0 row at a
    # scalar offset (d0 = d + p, h0 = h + p => j shifts by 6 p).
    j0_0, dlo_0 = _row_maps(grids[0])
    j0_4, dlo_4 = _row_maps(grids[4])
    v0 = t_arr + _C[0]
    q_sd = dlo_4(t_arr) + p - dlo_0(v0)
    q_sj = j0_4(t_arr) + 6 * p - j0_0(v0)
    assert q_sd.min() >= 0 and q_sj.min() >= 0, (q_sd.min(), q_sj.min())

    # Global row stride: covers every level's own band and every consumer's
    # j-reach, so one lane shift ds * J_STORE + dj addresses all taps.
    J_STORE = max(max(J),
                  max(int(j_shift[li].max()) + J[li + 1] for li in range(4)),
                  int(sk_j.max()) + J[3],
                  int(q_sj.max()) + J[4])

    # Ring lane extents: next power of two covering the row's valid band
    # (tap reads are full-row dynamic rolls; pltpu.roll is only correct for
    # power-of-two lane widths on TPU) and the q-write window.
    plane = [0] + [DW[li] * J_STORE for li in range(1, 5)]
    P = DW[4] * J_STORE
    P_pad = _round_up(max(P, 128), 128)
    S = P_pad // R

    def _pow2(x):
        r = 128
        while r < x:
            r *= 2
        return r

    lanes = []
    for li in range(4):
        dws = max(DW[li], int(d_shift[li].max()) + DW[li + 1])
        need = (dws + 1) * J_STORE
        if li == 0:
            need = max(need, int(q_sd.max()) * J_STORE + int(q_sj.max())
                       + P_pad)
        lanes.append(_pow2(max(need, P_pad)))
    lanes = tuple(lanes)

    # Logits-plane lane -> latent symbol mapping + active mask. Lane
    # m = rel_d * J_STORE + j; only j < J[4] can be a real cell.
    m = np.arange(P_pad)
    rel_d = m // J_STORE
    jj = m % J_STORE
    d = dlo_4(t_arr)[:, None] + rel_d[None, :]
    h = jj[None, :] + j0_4(t_arr)[:, None] - 5 * d
    w = t_arr[:, None] - 25 * d - 5 * h
    valid = ((rel_d < DW[4])[None, :] & (jj < J[4])[None, :]
             & (d >= 0) & (d < C) & (h >= 0) & (h < H) & (w >= 0) & (w < W))
    n = C * H * W
    flat = np.where(valid, (d * H + np.maximum(h, 0)) * W + np.maximum(w, 0), n)
    assert int(valid.sum()) == n, (valid.sum(), n)
    on = np.sort(flat[valid].ravel())
    assert (on == np.arange(n)).all(), 'idx_map is not a permutation'

    active = valid[:, None, :].astype(np.int32)       # (T, 1, P_pad)
    idx_map = flat.astype(np.int32)                   # (T, P_pad)

    # Sub-iterations visit only lanes that can ever be active: R-wide chunks
    # anchored at each band row (j < J[4]); dead j-lanes between rows are
    # never processed. chunk_offs are static; per-(step, chunk) any-active
    # flags let the kernel skip empty chunks (the reverse encoder reads the
    # same flags, keeping the two bit-exactly in step).
    row_span = -(-J[4] // R) * R
    if row_span <= J_STORE and P_pad >= (DW[4] - 1) * J_STORE + row_span:
        # Row-anchored chunks: disjoint by construction (span fits the
        # stride), and every j >= J[4] dead lane is skipped.
        chunk_offs = tuple(dd * J_STORE + c * R
                           for dd in range(DW[4])
                           for c in range(row_span // R))
    else:
        # Small strides (tiny shapes): plain sequential coverage.
        chunk_offs = tuple(off for off in range(0, P_pad, R))
    S = len(chunk_offs)
    covered = np.zeros(P_pad, bool)
    overlap = np.zeros(P_pad, np.int32)
    for off in chunk_offs:
        covered[off:off + R] = True
        overlap[off:off + R] += 1
    assert (covered | ~valid.any(axis=0)).all(), 'chunks miss active lanes'
    assert (overlap <= 1).all(), 'overlapping rANS chunks'
    subit = np.stack([valid[:, off:off + R].any(axis=1)
                      for off in chunk_offs], axis=1).astype(np.int32)

    NS = _TBL_SUBIT + S
    table = np.zeros((T, 1, NS), np.int32)
    for li in range(4):
        table[:, 0, 18 * li:18 * li + 18] = (
            d_shift[li] * J_STORE + j_shift[li])
    table[:, 0, _TBL_SKIP] = sk_d * J_STORE + sk_j
    table[:, 0, _TBL_Q] = q_sd * J_STORE + q_sj
    table[:, 0, _TBL_SUBIT:] = subit

    # Pad the step axis to a multiple of K_STEPS (the kernels process
    # K_STEPS wavefront steps per grid iteration to amortize the per-step
    # pipeline overhead). Padded steps have no active cells and all
    # sub-iteration flags zero — pure no-ops.
    T_pad = _round_up(T, K_STEPS)
    if T_pad != T:
        table = np.concatenate(
            [table, np.zeros((T_pad - T, 1, NS), np.int32)], axis=0)
        active = np.concatenate(
            [active, np.zeros((T_pad - T, 1, P_pad), np.int32)], axis=0)
        idx_map = np.concatenate(
            [idx_map, np.full((T_pad - T, P_pad), n, np.int32)], axis=0)

    wcap = _round_up(n + 2 * R, 128)
    return PallasSchedule(latent_shape=latent_shape, T=T, J_STORE=J_STORE,
                          P=P, P_pad=P_pad, S=S, DW=tuple(DW), J=tuple(J),
                          lanes=lanes, plane=tuple(plane), table=table,
                          active=active, idx_map=idx_map,
                          chunk_offs=chunk_offs, wcap=wcap)


# ---------------------------------------------------------------------------
# Kernel helpers (all rANS vectors are lane-major (1, R); cross-lane moves
# are one-hot matvecs at HIGHEST precision — exact for 16-bit integers)
# ---------------------------------------------------------------------------

def _excl_rank(ni):
    """Exclusive prefix sum over lanes: (1, R) i32 -> (1, R) i32.

    DEFAULT precision (one bf16 MXU pass) is exact here: operands are 0/1
    and results <= R <= 256, all exactly representable in bf16."""
    mstrict = (jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
               < jax.lax.broadcasted_iota(jnp.int32, (R, R), 1))
    out = jax.lax.dot_general(ni.astype(jnp.float32),
                              mstrict.astype(jnp.float32),
                              (((1,), (0,)), ((), ())))
    return out.astype(jnp.int32)


def _gather_words(row0, row1, pos):
    """Select words at in-window positions pos (1, R) from two stream rows
    (1, 128) each; pos in [0, 256).

    One-hot matvecs at DEFAULT precision (single bf16 MXU pass each): the
    16-bit words are split into bytes (<= 255, bf16-exact; at most one
    one-hot hit per output lane, so sums stay exact) — 4 one-pass matmuls
    instead of 2 six-pass f32-HIGHEST ones."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (128, R), 0)
    oh0 = (i0 == pos).astype(jnp.float32)
    oh1 = (i0 + 128 == pos).astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))

    def sel(row, oh):
        hi = (row >> 8).astype(jnp.float32)
        lo = (row & 0xFF).astype(jnp.float32)
        h = jax.lax.dot_general(hi, oh, dims)
        l = jax.lax.dot_general(lo, oh, dims)
        return h.astype(jnp.int32) * 256 + l.astype(jnp.int32)

    return sel(row0, oh0) + sel(row1, oh1)


def _scatter_words(word, pos, valid):
    """Place word lanes (1, R) i32 at in-window positions pos (1, R) over two
    128-lane rows; returns (row0, row1, mask0, mask1). One-hot matvecs that
    contract the shared R axis directly ((1, R) x (128, R)) — no transposes.
    Byte-split DEFAULT-precision matmuls (exact; see _gather_words)."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (128, R), 0)
    oh0 = ((i0 == pos) & valid).astype(jnp.float32)          # (128, R)
    oh1 = ((i0 + 128 == pos) & valid).astype(jnp.float32)
    hi = (word >> 8).astype(jnp.float32)
    lo = (word & 0xFF).astype(jnp.float32)
    ones = jnp.ones((1, R), jnp.float32)
    dims = (((1,), (1,)), ((), ()))

    def place(oh):
        h = jax.lax.dot_general(hi, oh, dims)
        l = jax.lax.dot_general(lo, oh, dims)
        r = h.astype(jnp.int32) * 256 + l.astype(jnp.int32)
        m = jax.lax.dot_general(ones, oh, dims) > 0.5
        return r, m

    r0, m0 = place(oh0)
    r1, m1 = place(oh1)
    return r0, r1, m0, m1


def _quantize_cdf_kernel(logits, L):
    """In-kernel twin of rans.quantize_cdf on (L, P) sublane-major tables:
    logits (L, P) f32 -> (freq, cdf_low) (L, P) i32 with column sums SCALE."""
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=0, keepdims=True)
    scaled = jnp.floor(probs * np.float32(rans.SCALE - L)).astype(jnp.int32) + 1
    deficit = rans.SCALE - jnp.sum(scaled, axis=0, keepdims=True)
    pmax = jnp.max(probs, axis=0, keepdims=True)
    lidx = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 0)
    am = jnp.min(jnp.where(probs == pmax, lidx, L), axis=0, keepdims=True)
    freq = scaled + jnp.where(lidx == am, deficit, 0)
    # cdf_low[l, p] = sum_{k < l} freq[k, p]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (L, L, 1), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (L, L, 1), 0))
    cdf = jnp.sum(jnp.where(mask, freq[None, :, :], 0), axis=1)
    return freq, cdf


# ---------------------------------------------------------------------------
# Forward kernel (teacher-forced encode scan / decode scan — one executable)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def make_forward(latent_shape: Tuple[int, int, int], kf: int, L: int, B: int,
                 interpret: bool = False):
    """Returns (fn, sched). fn(weights, tables, true_syms, streams,
    init_states, mode) -> (syms, freq_sel, start_sel), all (B, T, 1, P_pad)."""
    sched = build_pallas_schedule(latent_shape)
    T, P, P_pad, S = sched.T, sched.P, sched.P_pad, sched.S
    DW, lanes, plane = sched.DW, sched.lanes, sched.plane
    chunk_offs = sched.chunk_offs
    NS = sched.table.shape[-1]
    wrows = sched.wcap // 128 + 2
    K1 = 18 * Q_CH
    K = 18 * kf
    assert L >= 2

    ablate = _ABLATE
    if interpret:
        def _roll(x, s, total=None):
            return jnp.roll(x, s, 1)
    else:
        def _roll(x, s, total=None):
            return pltpu.roll(x, jnp.asarray(s, jnp.int32)
                              + jnp.int32(x.shape[1]), 1)

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
            y1s[:] = jnp.zeros(y1s.shape, jnp.float32)
            X[:] = jnp.zeros(X.shape, jnp.float32)
            vals[:] = jnp.zeros(vals.shape, jnp.float32)

        if ablate == 'empty':
            # Floor measurement: touch every streamed ref once, no compute.
            z = (table_ref[0, 0, 0] + mode_ref[0]
                 + act_ref[0, 0, 0] + true_ref[0, 0, 0, 0]
                 + inst_ref[0, 0, 0].astype(jnp.int32)
                 + stream_ref[0, 0, 0].astype(jnp.int32))
            zz = jnp.zeros((1, R), jnp.int32) + z
            sym_out[0, 0, :, 0:R] = zz
            fsel_out[0, 0, :, 0:R] = zz
            ssel_out[0, 0, :, 0:R] = zz
            return

        # Pre-zero the iteration's output blocks once; active chunks then
        # overwrite their lanes and inactive chunks need no branch at all.
        zeros_blk = jnp.zeros(sym_out.shape, jnp.int32)
        sym_out[:] = zeros_blk
        fsel_out[:] = zeros_blk
        ssel_out[:] = zeros_blk

        for k in range(K_STEPS):
            _one_step(k, tb, table_ref, mode_ref, pad_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                      w4_ref, b4_ref, k1_ref, k2_ref, k3_ref, centers_ref,
                      act_ref, true_ref, stream_ref,
                      sym_out, fsel_out, ssel_out,
                      r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s)

    def _one_step(k, tb, table_ref, mode_ref, pad_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  w4_ref, b4_ref, k1_ref, k2_ref, k3_ref, centers_ref,
                  act_ref, true_ref, stream_ref,
                  sym_out, fsel_out, ssel_out,
                  r0, r1, r2, r3, X, y1s, vals, states_s, gptr_s):
        t = tb * K_STEPS + k
        slot = jax.lax.rem(t, VR)
        if ablate in ('staticslot', 'staticboth'):  # timing probe: static slot idx
            rows = [(k - 31 + off) % VR for off in _OFFS]
        else:
            rows = [jax.lax.rem(t + 8 * VR - 31 + off, VR) for off in _OFFS]

        def fill_X(ring, li, width, ch):
            # Dynamic lane-offset reads are not lowerable; a full-row
            # dynamic roll + static slice is (and wrapped lanes only ever
            # land on dead cells, which stay finite by construction).
            # Fully-masked taps are skipped: their folded weights are exact
            # zeros, so the stale (finite) X columns contribute nothing.
            taps = _unmasked_taps(first=(li == 1))
            if ablate == 'notaps':
                taps = taps[:1]
            for o in taps:
                if ablate in ('staticshift', 'staticboth'):
                    sh = (o * 3) % 7  # timing probe: no scalar-table read
                else:
                    sh = table_ref[k, 0, 18 * (li - 1) + o]
                row = _roll(ring[rows[o]], -sh)
                X[o * ch:(o + 1) * ch, 0:width] = row[:, 0:width]

        def layer_dot(w_ref, b_ref, kdim, width):
            if ablate == 'nodot':
                return jnp.zeros((b_ref.shape[0], width), jnp.float32) + b_ref[:]
            if ablate == 'bf16dot':
                return jax.lax.dot_general(
                    w_ref[:].astype(jnp.bfloat16),
                    X[0:kdim, 0:width].astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + b_ref[:]
            return jax.lax.dot_general(
                w_ref[:], X[0:kdim, 0:width], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b_ref[:]

        # Layer 1 (q ring rows carry Q_CH replicated sublanes).
        if ablate == 'noconv':
            def fill_X(ring, li, width, ch):
                pass
            def layer_dot(w_ref, b_ref, kdim, width):
                return jnp.zeros((b_ref.shape[0], width), jnp.float32) + b_ref[:]
        fill_X(r0, 1, plane[1], Q_CH)
        y1 = jax.nn.relu(layer_dot(w1_ref, b1_ref, K1, plane[1]))
        y1s[:, 0:plane[1]] = y1
        r1[slot, :, 0:plane[1]] = y1

        # Layer 2.
        fill_X(r1, 2, plane[2], kf)
        y2 = jax.nn.relu(layer_dot(w2_ref, b2_ref, K, plane[2]))
        r2[slot, :, 0:plane[2]] = y2

        # Layer 3 (+ residual skip from this step's y1, no relu).
        fill_X(r2, 3, plane[3], kf)
        skip = _roll(y1s[:], -table_ref[k, 0, _TBL_SKIP])[:, 0:plane[3]]
        y3 = layer_dot(w3_ref, b3_ref, K, plane[3]) + skip
        r3[slot, :, 0:plane[3]] = y3

        # Layer 4: logits over the padded plane (lanes >= P are junk, masked
        # by `active`). The reference ReLUs its output layer too
        # (ref: probclass.py:220,227-233).
        fill_X(r3, 4, P_pad, kf)
        logits = jax.nn.relu(layer_dot(w4_ref, b4_ref, K, P_pad))
        freq, cdf = _quantize_cdf_kernel(logits, L)    # (L, P_pad) i32

        mode = mode_ref[0]
        lidx = jax.lax.broadcasted_iota(jnp.int32, (L, R), 0)

        for si, base in enumerate(chunk_offs):

            @pl.when(table_ref[k, 0, _TBL_SUBIT + si] != 0)
            def _sub(base=base):
                fq = freq[:, base:base + R]                  # (L, R) i32
                cl = cdf[:, base:base + R]
                a = act_ref[k, :, base:base + R] != 0        # (1, R)
                st = states_s[:]                             # (1, R) u32
                slot_u = st & jnp.uint32(rans.SCALE - 1)
                slot_i = slot_u.astype(jnp.int32)
                symd = jnp.sum((cl <= slot_i).astype(jnp.int32),
                               axis=0, keepdims=True) - 1    # (1, R)
                ohd = lidx == symd
                fd = jnp.sum(jnp.where(ohd, fq, 0), axis=0, keepdims=True)
                sd = jnp.sum(jnp.where(ohd, cl, 0), axis=0, keepdims=True)
                x = (fd.astype(jnp.uint32) * (st >> rans.SCALE_BITS)
                     + slot_u - sd.astype(jnp.uint32))
                if ablate != 'norans':
                    need = a & (x < jnp.uint32(rans.RANS_L))
                    ni = need.astype(jnp.int32)
                    rank = _excl_rank(ni)
                    total = jnp.sum(ni)
                    gp = gptr_s[0]
                    grow = gp // 128
                    goff = gp - grow * 128
                    row0 = stream_ref[0, pl.ds(grow, 1), :].astype(jnp.int32)
                    row1 = stream_ref[0, pl.ds(grow + 1, 1), :].astype(jnp.int32)
                    pos = jnp.where(need, goff + rank, -1)
                    wsel = _gather_words(row0, row1, pos)
                    x = jnp.where(need,
                                  (x << rans.WORD_BITS)
                                  | wsel.astype(jnp.uint32), x)
                    states_s[:] = jnp.where(a, x, st)
                    gptr_s[0] = gp + total

                sym_true = true_ref[0, k, :, base:base + R]  # (1, R) i32
                sym = jnp.where(mode == 1, sym_true, symd)
                sym = jnp.where(a, sym, 0)
                ohs = lidx == sym
                fsel = jnp.sum(jnp.where(ohs, fq, 0), axis=0, keepdims=True)
                ssel = jnp.sum(jnp.where(ohs, cl, 0), axis=0, keepdims=True)
                vals[:, base:base + R] = jnp.sum(
                    jnp.where(ohs, centers_ref[:], 0.0), axis=0, keepdims=True)
                sym_out[0, k, :, base:base + R] = sym
                fsel_out[0, k, :, base:base + R] = fsel
                ssel_out[0, k, :, base:base + R] = ssel

            # No else-branch: outputs are pre-zeroed per iteration, and the
            # q-write masks vals by THIS step's act, so stale vals lanes from
            # earlier steps are never read where act == 0.

        # Q-row write: the latent rectangle at lanes [0, P_pad) of a
        # pad-valued row, rotated into place (dynamic stores at lane
        # granularity are not lowerable either).
        pad = pad_ref[0]
        rect = jnp.where(act_ref[k] != 0, vals[:], pad)      # (1, P_pad)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes[0]), 1)
        rect_full = jnp.pad(rect, ((0, 0), (0, lanes[0] - P_pad)))
        row = jnp.where(lane < P_pad, rect_full, pad)
        r0[slot] = jnp.zeros((Q_CH, lanes[0]), jnp.float32) + _roll(
            row, table_ref[k, 0, _TBL_Q])

    TB = sched.table.shape[0] // K_STEPS
    grid = (B, TB)
    in_specs = [
        pl.BlockSpec((K_STEPS, 1, NS), lambda b, t: (t, 0, 0),
                     memory_space=pltpu.SMEM),                         # table
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
        pl.BlockSpec((K_STEPS, 1, P_pad), lambda b, t: (t, 0, 0)),     # active
        pl.BlockSpec((1, K_STEPS, 1, P_pad), lambda b, t: (b, t, 0, 0)),  # true
        pl.BlockSpec((1, wrows, 128), lambda b, t: (b, 0, 0)),         # stream
        pl.BlockSpec((1, 1, R), lambda b, t: (b, 0, 0)),               # states
    ]
    out_specs = tuple(
        pl.BlockSpec((1, K_STEPS, 1, P_pad), lambda b, t: (b, t, 0, 0))
        for _ in range(3))
    T_pad = TB * K_STEPS
    # All-i32 outputs: freq/cdf values are < 2^17, and unsigned output
    # blocks fall off Mosaic's pipelined-DMA path (measured ~25 us/step).
    out_shape = (jax.ShapeDtypeStruct((B, T_pad, 1, P_pad), jnp.int32),
                 jax.ShapeDtypeStruct((B, T_pad, 1, P_pad), jnp.int32),
                 jax.ShapeDtypeStruct((B, T_pad, 1, P_pad), jnp.int32))
    X_K = max(K, K1)
    scratch = [
        pltpu.VMEM((VR, Q_CH, lanes[0]), jnp.float32),   # r0
        pltpu.VMEM((VR, kf, lanes[1]), jnp.float32),     # r1
        pltpu.VMEM((VR, kf, lanes[2]), jnp.float32),     # r2
        pltpu.VMEM((VR, kf, lanes[3]), jnp.float32),     # r3
        pltpu.VMEM((X_K, max(lanes[1], P_pad)), jnp.float32),   # X
        pltpu.VMEM((kf, lanes[1]), jnp.float32),         # y1s (pow2 wide)
        pltpu.VMEM((1, P_pad), jnp.float32),             # vals
        pltpu.VMEM((1, R), jnp.uint32),                  # states
        pltpu.SMEM((1,), jnp.int32),                     # gptr
    ]

    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))

    def fn(weights, tables, true_syms, streams, init_states, mode):
        (pad_v, w1, b1, w2, b2, w3, b3, w4, b4, k1, k2, k3, centers) = weights
        table, active = tables
        return call(table, mode, pad_v, w1, b1, w2, b2, w3, b3, w4, b4,
                    k1, k2, k3, centers, active, true_syms, streams,
                    init_states)

    return fn, sched


# ---------------------------------------------------------------------------
# Reverse interleaved-rANS encoder kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def make_reverse(latent_shape: Tuple[int, int, int], B: int,
                 interpret: bool = False):
    """fn(tables, freq_sel, start_sel) -> (words (B, wrows, 128) u32 in
    emission order, n_words (B, 1, 1) i32, states (B, 1, R) u32). The
    decode-order stream is the first n words flattened, reversed."""
    sched = build_pallas_schedule(latent_shape)
    T, P_pad, S = sched.T, sched.P_pad, sched.S
    chunk_offs = sched.chunk_offs
    NS = sched.table.shape[-1]
    wrows = sched.wcap // 128 + 2
    ablate = _ABLATE_REV

    def kernel(table_ref, act_ref, fsel_ref, ssel_ref,
               words_out, nw_out, st_out, states_s, gw_s):
        tb = pl.program_id(1)

        @pl.when(tb == 0)
        def _init():
            states_s[:] = jnp.full((1, R), rans.RANS_L, jnp.uint32)
            gw_s[0] = 0
            words_out[:] = jnp.zeros(words_out.shape, jnp.uint32)

        for k in range(K_STEPS - 1, -1, -1):
            _rev_step(k, table_ref, act_ref, fsel_ref, ssel_ref,
                      words_out, states_s, gw_s)
        nw_out[:] = jnp.zeros((1, 1, 1), jnp.int32) + gw_s[0]
        st_out[0] = states_s[:]

    def _rev_step(k, table_ref, act_ref, fsel_ref, ssel_ref,
                  words_out, states_s, gw_s):
        for si in range(S - 1, -1, -1):
            base = chunk_offs[si]

            @pl.when(table_ref[k, 0, _TBL_SUBIT + si] != 0)
            def _sub(base=base):
                f = jnp.maximum(fsel_ref[0, k, :, base:base + R],
                                1).astype(jnp.uint32)        # (1, R)
                sv = ssel_ref[0, k, :, base:base + R].astype(jnp.uint32)
                a = act_ref[k, :, base:base + R] != 0
                st = states_s[:]
                emit = a & (st >= (f << rans.WORD_BITS))
                word = (st & jnp.uint32(rans.WORD_MASK)).astype(jnp.int32)
                ei = emit.astype(jnp.int32)
                fwd = _excl_rank(ei)
                total = jnp.sum(ei)
                # Emission order: descending lane rank, so the final global
                # reversal restores decode-read order (see coding/rans.py).
                gw = gw_s[0]
                grow = gw // 128
                goff = gw - grow * 128
                pos = jnp.where(emit, goff + total - 1 - fwd, -1)
                if ablate != 'noscatter':
                    r0n, r1n, m0, m1 = _scatter_words(word, pos, emit)
                    old0 = words_out[0, pl.ds(grow, 1), :].astype(jnp.int32)
                    old1 = words_out[0, pl.ds(grow + 1, 1), :].astype(jnp.int32)
                    words_out[0, pl.ds(grow, 1), :] = jnp.where(
                        m0, r0n, old0).astype(jnp.uint32)
                    words_out[0, pl.ds(grow + 1, 1), :] = jnp.where(
                        m1, r1n, old1).astype(jnp.uint32)
                st = jnp.where(emit, st >> rans.WORD_BITS, st)
                if ablate == 'nodiv':
                    xn = ((st >> 4) << rans.SCALE_BITS) + (st & 15) + sv
                elif ablate == 'noscatter':
                    xn = ((st // f) << rans.SCALE_BITS) + (st % f) + sv
                else:
                    xn = ((st // f) << rans.SCALE_BITS) + (st % f) + sv
                states_s[:] = jnp.where(a, xn, st)
                gw_s[0] = gw + total

    TB = sched.table.shape[0] // K_STEPS
    grid = (B, TB)
    in_specs = [
        pl.BlockSpec((K_STEPS, 1, NS), lambda b, t: (TB - 1 - t, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((K_STEPS, 1, P_pad), lambda b, t: (TB - 1 - t, 0, 0)),
        pl.BlockSpec((1, K_STEPS, 1, P_pad),
                     lambda b, t: (b, TB - 1 - t, 0, 0)),
        pl.BlockSpec((1, K_STEPS, 1, P_pad),
                     lambda b, t: (b, TB - 1 - t, 0, 0)),
    ]
    out_specs = (pl.BlockSpec((1, wrows, 128), lambda b, t: (b, 0, 0)),
                 pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0)),
                 pl.BlockSpec((1, 1, R), lambda b, t: (b, 0, 0)))
    out_shape = (jax.ShapeDtypeStruct((B, wrows, 128), jnp.uint32),
                 jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
                 jax.ShapeDtypeStruct((B, 1, R), jnp.uint32))
    scratch = [pltpu.VMEM((1, R), jnp.uint32), pltpu.SMEM((1,), jnp.int32)]

    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')))

    def fn(tables, freq_sel, start_sel):
        table, active = tables
        return call(table, active, freq_sel, start_sel)

    return fn, sched
