"""Planar (per-depth-plane) wavefront schedule for general kernel_size.

The K=3 monolith (pallas_kernel.py) holds every layer's activation rings
for the FULL 3D wavefront t = 25d + 5h + w in VMEM — possible only
because K=3's ring lifetime (38 slots x ~1-2k lanes) fits in ~16 MB. For
K=5 (the reference's default, ref pc_configs/base:3) the 3D schedule
t = 81d + 9h + w needs 203-slot rings x ~1.5k lanes ≈ 60+ MB — far
beyond VMEM, which is why round 2 left K≠3 on the 0.018 MP/s 'direct'
fallback. This module is the TPU-first fix.

DEPTH DECOMPOSITION. A masked conv3d's kernel depth slices j < kd-1 read
only strictly-lower depth planes (ref probclass.py:150-176 — only the
LAST depth slice is causally masked). When coding symbol plane d, planes
< d are fully known, so each layer's contribution from its lower kernel
slices is an ordinary 2D VALID conv over known planes — bulk MXU work
with no sequential structure ("bias planes"). Only the top (masked)
slice is autoregressive, and it reaches only spatially within the
CURRENT plane. Coding therefore runs C sequential rounds of

  XLA:    bias_l[d] = sum_{j<kd-1} conv2d(act_{l-1}[d-kd+1+j], w_l[j]) + b_l
  Pallas: a 2D wavefront over the plane (planar_kernel.py)

with tiny VMEM state: per-layer rings of VR = CTR+1 rows x <=128 lanes.

2D RING ALGEBRA (mirror of ring.py's, one dimension down). Index row
v = BH*h + w with BH = reach + 1 (reach = 4*(K//2), the stack's spatial
reach). Lanes are ABSOLUTE h (a row holds cell (h, w = v - BH*h) at lane
h — every grid's H fits one or two 128-lane registers), so every tap
(dy, dx) is a STATIC lane shift dy into the producer ring row
v_in = v_out + off, off = BH*dy + dx. With per-layer write delay
c_l = CTR*l (CTR = BH*(K//2) + K//2), layer l writes row v_l = t - CTR*l
at step t and its unmasked taps read producer rows written in steps
[t - CTR, t] — ring slots VR = CTR + 1. The residual skip and the
q-plane write also land in the SAME step (the identities
(K-1)*(BH+1) = 2*CTR and reach*(BH+1) = 4*CTR), exactly like the 3D
kernel's y1s skip. The schedule is shifted by c_0 = 4*CTR so there are
no pre-history rows: pre-real activation planes (aligned depth < 0) are
all-pad constants (ring._pad_constants), not in-wavefront state.

rANS: the step's symbol band is <= ceil(W0/BH) + 1 cells at lanes
[h_lo(v), h_hi(v)] — rolled to lane 0 it is ONE R-lane chunk per image
per step (vs up to ~6 for the 3D kernel), which shortens the sequential
decode chain per symbol.

This module is pure schedule/layout math (numpy), shared by
planar_kernel.py and the tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

NUM_LAYERS = 4  # conv0 + 2 residual convs + conv_out (ref probclass.py:208-212)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def geometry(K: int) -> Tuple[int, int, int, int]:
    """(kd, reach, BH, CTR)."""
    kd = K // 2 + 1
    reach = NUM_LAYERS * (K // 2)
    BH = reach + 1
    CTR = BH * (K // 2) + K // 2
    return kd, reach, BH, CTR


def grids_2d(latent_hw: Tuple[int, int], K: int):
    """2D grid (H, W) per level 0..4 (level 0 = padded plane, 4 = latent)."""
    H, W = latent_hw
    _, reach, _, _ = geometry(K)
    g = [(H + 2 * reach, W + 2 * reach)]
    for _ in range(NUM_LAYERS):
        g.append((g[-1][0] - (K - 1), g[-1][1] - (K - 1)))
    assert g[-1] == (H, W), (g, latent_hw)
    return tuple(g)


def unmasked_taps(K: int, first: bool) -> Tuple[Tuple[int, int], ...]:
    """Top-slice taps with nonzero causal mask, as (dy, dx)."""
    from ..models.probclass import spatial_mask
    m = spatial_mask(K, first)
    return tuple((dy, dx) for dy in range(K) for dx in range(K)
                 if m[dy, dx] > 0)


class PlanarSchedule(NamedTuple):
    latent_shape: Tuple[int, int, int]   # (C, H, W)
    K: int
    BH: int
    CTR: int
    VR: int
    T2: int                              # wavefront steps per plane
    T2_pad: int                          # rounded up to K_STEPS
    HL: Tuple[int, ...]                  # lane width (pow2 >= H_l) per level
    grids: Tuple[Tuple[int, int], ...]
    taps: Tuple[Tuple[Tuple[int, int], ...], ...]  # per layer 1..4
    h_lo: np.ndarray                     # (T2_pad,) level-4 band start h
    n_band: int                          # max band cells (level 4)
    table: np.ndarray                    # (T2_pad, 1, 2): [h_lo4, subit flag]
    active_cm: np.ndarray                # (T2_pad, 1, R) rolled band mask
    idx_cm: np.ndarray                   # (T2_pad, R) -> h*W + w (or H*W)
    wcap: int                            # full-image stream word capacity


K_STEPS = 8
R = 32  # rANS lanes (must match pallas_kernel.R)


@functools.lru_cache(maxsize=8)
def build_planar_schedule(latent_shape: Tuple[int, int, int],
                          K: int) -> PlanarSchedule:
    C, H, W = latent_shape
    kd, reach, BH, CTR = geometry(K)
    grids = grids_2d((H, W), K)
    assert (K - 1) * (BH + 1) == 2 * CTR
    assert reach * (BH + 1) == NUM_LAYERS * CTR

    # Steps: level l writes row v_l = t - CTR*l; every level must cover its
    # own grid's v range.
    T2 = 1 + max(BH * (g[0] - 1) + (g[1] - 1) + CTR * l
                 for l, g in enumerate(grids))
    T2_pad = _round_up(T2, K_STEPS)
    t_arr = np.arange(T2_pad)

    def _pow2(x):
        r = 128
        while r < x:
            r *= 2
        return r

    HL = tuple(_pow2(g[0]) for g in grids)

    taps = tuple(unmasked_taps(K, first=(li == 1))
                 for li in range(1, NUM_LAYERS + 1))
    # Unmasked taps must only read already-written producer rows
    # (off <= CTR; equality = same-step, handled by in-step layer order).
    for tp in taps:
        assert max(BH * dy + dx for dy, dx in tp) <= CTR, (K, tp)

    # Level-4 band of step t: v4 = t - 4*CTR; cells (h, w = v4 - BH*h),
    # h in [h_lo, h_hi].
    v4 = t_arr - NUM_LAYERS * CTR
    h_lo = np.clip(-(-(v4 - (W - 1)) // BH), 0, max(H - 1, 0))
    h_hi = np.minimum(H - 1, np.floor_divide(np.maximum(v4, 0), BH))
    n_band = int(np.max(np.where(v4 >= 0, h_hi - h_lo + 1, 0)))
    assert n_band <= R, (n_band, R, 'band exceeds one rANS chunk; '
                         'unsupported latent height/width ratio')

    # Rolled chunk layout: lane r of the chunk = band cell h = h_lo + r.
    r_idx = np.arange(R)
    h = h_lo[:, None] + r_idx[None, :]
    w = v4[:, None] - BH * h
    valid = ((v4[:, None] >= 0) & (r_idx[None, :] <= (h_hi - h_lo)[:, None])
             & (h >= 0) & (h < H) & (w >= 0) & (w < W))
    HW = H * W
    assert int(valid.sum()) == HW, (int(valid.sum()), HW)
    idx_cm = np.where(valid, h * W + np.maximum(w, 0), HW).astype(np.int32)

    table = np.zeros((T2_pad, 1, 2), np.int32)
    table[:, 0, 0] = h_lo
    table[:, 0, 1] = valid.any(axis=1)

    wcap = _round_up(C * H * W + 2 * R, 128)
    return PlanarSchedule(
        latent_shape=latent_shape, K=K, BH=BH, CTR=CTR, VR=CTR + 1,
        T2=T2, T2_pad=T2_pad, HL=HL, grids=grids, taps=taps,
        h_lo=h_lo.astype(np.int32), n_band=n_band, table=table,
        active_cm=valid[:, None, :].astype(np.int32), idx_cm=idx_cm,
        wcap=wcap)


def skew_rows(plane_chw, BH: int, T_rows: int, lanes: int):
    """(ch, Hg, Wg) plane -> (T_rows, ch, lanes) rows with
    rows[v, :, h] = plane[:, h, v - BH*h] (junk elsewhere), NO gathers:
    pad W to BH*G, split w = BH*g + r, then the stride-1 skew over (h, g)
    is pad -> flatten -> reshape -> transpose. jnp/numpy agnostic."""
    import jax.numpy as jnp
    xp = jnp if not isinstance(plane_chw, np.ndarray) else np
    ch, Hg, Wg = plane_chw.shape
    G = -(-Wg // BH)
    p = xp.pad(plane_chw, ((0, 0), (0, 0), (0, BH * G - Wg)))
    q = p.reshape(ch, Hg, G, BH)                      # w = BH*g + r
    q = xp.transpose(q, (0, 3, 1, 2))                 # (ch, BH, Hg, G)
    # stride-1 skew: D[m, h] = A[h, m - h], m in [0, Hg + G - 1)
    M = Hg + G - 1
    f = xp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Hg))).reshape(ch, BH, -1)
    f = f[:, :, :Hg * (G + Hg - 1)].reshape(ch, BH, Hg, G + Hg - 1)
    d = xp.transpose(f, (0, 1, 3, 2))                 # (ch, BH, M', Hg)
    d = d[:, :, :M, :]
    # v = BH*m + r  ->  interleave r into the row index
    rows = xp.transpose(d, (2, 1, 0, 3))              # (M, BH, ch, Hg)
    rows = rows.reshape(M * BH, ch, Hg)
    out = xp.zeros((T_rows, ch, lanes), plane_chw.dtype)
    n = min(T_rows, M * BH)
    if xp is np:
        out[:n, :, :Hg] = rows[:n]
    else:
        out = out.at[:n, :, :Hg].set(rows[:n])
    return out


def unskew_rows(rows, BH: int, grid_hw: Tuple[int, int]):
    """Inverse of skew_rows: (T_rows, ch, lanes) -> (ch, Hg, Wg) with
    plane[:, h, w] = rows[BH*h + w, :, h]."""
    import jax.numpy as jnp
    xp = jnp if not isinstance(rows, np.ndarray) else np
    T_rows, ch, lanes = rows.shape
    Hg, Wg = grid_hw
    G = -(-Wg // BH)
    M = Hg + G - 1
    need = M * BH
    r = rows[:, :, :Hg]
    if T_rows < need:
        pad = xp.zeros((need - T_rows, ch, Hg), rows.dtype)
        r = xp.concatenate([r, pad], axis=0)
    else:
        r = r[:need]
    d = r.reshape(M, BH, ch, Hg)
    d = xp.transpose(d, (2, 1, 0, 3))                 # (ch, BH, M, Hg)
    # invert the stride-1 skew: A[h, m - h] = D[m, h]
    dpad = xp.concatenate(
        [d, xp.zeros((ch, BH, Hg + G - 1, Hg), rows.dtype)], axis=2)
    f = xp.transpose(dpad, (0, 1, 3, 2)).reshape(ch, BH, -1)
    # f now has F[h, m] at h*(M + pad...)  — rebuild A[h, g] = F[h, h + g]
    F = f.reshape(ch, BH, Hg, -1)                     # (ch, BH, Hg, 2M-ish)
    cols = F.shape[-1]
    # A[h, g] = F[h, h + g]: another stride-1 skew, other direction —
    # flatten with pitch cols, read at h*cols + h + g = h*(cols+1) + g.
    flat = F.reshape(ch, BH, Hg * cols)
    want = Hg * (cols + 1)
    flat = xp.concatenate(
        [flat, xp.zeros((ch, BH, want - Hg * cols), rows.dtype)], axis=2)
    A = flat.reshape(ch, BH, Hg, cols + 1)[:, :, :, :G]
    q = xp.transpose(A, (0, 2, 3, 1))                 # (ch, Hg, G, BH)
    plane = q.reshape(ch, Hg, G * BH)[:, :, :Wg]
    return plane
