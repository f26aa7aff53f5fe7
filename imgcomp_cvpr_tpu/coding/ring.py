"""Ring-buffer wavefront codec — the production decode path.

Fastest formulation of the activation-cached wavefront scan. Index every
cache cell by v = 25 d + 5 h + w. Then

- layer l writes EXACTLY ONE v-row per step: v_out = t + c_l with
  c_l = 31 * (4 - l) (each conv layer shifts the window center by (1,1,1)
  in (d,h,w) => 25 + 5 + 1 = 31 steps);
- that row's (2,3,3) causal window reads v-rows [v_out, v_out + 37] of the
  previous layer — offsets [-31, +6] relative to that layer's newest row;
  *unmasked* taps only reach offsets <= 0 (already written; +1..+6 rows are
  touched by masked, zero-weight taps only);
- a row's valid cells are doubly banded: d with u = v - 25 d in range
  (~(u_max+1)/25 of them) and, within the (d, h) plane, the diagonal band
  h + 5 d in [ceil((v - W + 1)/5), floor(v / 5)] — a CONSTANT width
  ~(W/5). Rows are therefore stored PACKED as (DW, J) planes with
  rel_d = d - d_lo(v) and j = h + 5 d - j0(v): for Kodak this is (19, 21)
  instead of the full (35, 70) plane (~6x fewer cells).

The packing commutes with the conv windows: for a tap (dz, dy, dx) the
input cell of output (rel_d, j) sits at (rel_d + d_shift, j + j_shift)
where d_shift = dz + d_lo_out - d_lo_in and j_shift = dy + 5 dz + j0_out -
j0_in are PER-STEP SCALARS (the 5 d term cancels; both are >= 0 for this
geometry — verified at schedule build). So each tap is one dynamic_slice
of the previous layer's slab, and each layer is one dense
(DW*J, 18*ch) @ (18*ch, ch) MXU matmul.

Each cache is a ring of the most recent 44 v-rows (stored twice,
ring[i] == ring[i + VR], so any 38-row window is one contiguous
dynamic_slice); rows are written at their packed origin, so writes are
fixed-offset update-slices. Pre-history rows (v < c_l) are pure functions
of the constant padding value (a VALID conv of a constant volume is
constant) — one (ch,) vector per layer seeds the rings. Cells outside a
row's valid band are dead storage: valid outputs never read them, masked
taps read finite garbage.

Bit-exactness: same contract as codec.py — encode (teacher-forced) and
decode run one executable with a traced mode flag.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import probclass as pc_lib
from . import rans
from . import wavefront

_WINDOW = [(dz, dy, dx) for dz in range(2) for dy in range(3) for dx in range(3)]
_OFFS = [25 * dz + 5 * dy + dx for dz, dy, dx in _WINDOW]
_SPAN = max(_OFFS) + 1          # 38: v-rows a window touches
VR = 44                          # ring rows (>= _SPAN + 6 junk rows)
_C = (124, 93, 62, 31, 0)        # v-row constant per level (q, L1..L4)


class RingSchedule(NamedTuple):
    base: wavefront.Schedule
    DW: Tuple[int, ...]        # packed plane d-extents per level (q, L1..L4)
    J: Tuple[int, ...]         # packed plane j-extents per level
    store: Tuple[Tuple[int, int], ...]  # ring storage (DWs, Js) per level 0..3
    d_shift: Tuple[np.ndarray, ...]  # (T, 18) int32 per layer 1..4
    j_shift: Tuple[np.ndarray, ...]  # (T, 18) int32 per layer 1..4
    skip_shift: np.ndarray     # (T, 2) int32 (d, j) shift of the L3 skip in y1
    lane_plane: np.ndarray     # (T, M) int32: lane -> rel_d*J4 + j in logits
    lane_q: np.ndarray         # (T, M) int32: lane -> rel_d*J0 + j in q row
    q_latent: np.ndarray       # (T, DW0, J0) bool: latent cells of the q row


def _grids(latent_shape, p=4):
    C, H, W = latent_shape
    g0 = (C + p, H + 2 * p, W + 2 * p)
    g1 = (g0[0] - 1, g0[1] - 2, g0[2] - 2)
    g2 = (g1[0] - 1, g1[1] - 2, g1[2] - 2)
    g3 = (g2[0] - 1, g2[1] - 2, g2[2] - 2)
    return (g0, g1, g2, g3, (C, H, W))


def _row_maps(grid):
    d_grid, h_grid, w_grid = grid
    u_max = 5 * (h_grid - 1) + w_grid - 1

    def j0(v):
        return np.maximum(0, -(-(v - (w_grid - 1)) // 5))

    def d_lo(v):
        return np.clip(-(-(v - u_max) // 25), 0, d_grid - 1)

    return j0, d_lo


@functools.lru_cache(maxsize=8)
def build_ring_schedule(latent_shape: Tuple[int, int, int],
                        context_size: int = 9) -> RingSchedule:
    assert context_size == 9, 'ring codec is specialized to kernel_size=3'
    # The v-row algebra requires the *linear* step assignment t = 25d+5h+w.
    base = wavefront.build_schedule(latent_shape, context_size, 'linear')
    C, H, W = latent_shape
    p = context_size // 2
    grids = _grids(latent_shape, p)
    T = base.T
    t_arr = np.arange(T)

    # Packed plane extents per level.
    DW, J = [], []
    for grid, c in zip(grids, _C):
        j0f, dlof = _row_maps(grid)
        d_grid, h_grid, w_grid = grid
        dw = jmax = 1
        for t in range(T):
            vv = t + c
            d_idx = np.arange(d_grid)
            u = vv - 25 * d_idx
            ok = (u >= 0) & (u <= 5 * (h_grid - 1) + w_grid - 1)
            if not ok.any():
                continue
            d_sel = d_idx[ok]
            h_hi = np.minimum(h_grid - 1, u[ok] // 5)
            dw = max(dw, int((d_sel - dlof(vv)).max()) + 1)
            jmax = max(jmax, int((h_hi + 5 * d_sel - j0f(vv)).max()) + 1)
        DW.append(dw)
        J.append(jmax)

    # Per-layer tap shifts (non-negative for this geometry; asserted).
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

    # L3 residual skip: L1 cell (d3+2, h3+2) => shifts vs y1's packed frame.
    # Valid skip cells are always valid L1 cells, but the rectangular slice
    # can overhang y1's valid extent at dead corners — widen y1's computed
    # plane to cover the slice (garbage in the extension is never read as a
    # valid value).
    j0_1, dlo_1 = _row_maps(grids[1])
    j0_3, dlo_3 = _row_maps(grids[3])
    v1 = t_arr + _C[1]
    v3 = t_arr + _C[3]
    sk_d = (dlo_3(v3) + 2 - dlo_1(v1)).astype(np.int32)
    sk_j = (j0_3(v3) + 12 - j0_1(v1)).astype(np.int32)
    assert sk_d.min() >= 0 and sk_j.min() >= 0
    DW[1] = max(DW[1], int(sk_d.max()) + DW[3])
    J[1] = max(J[1], int(sk_j.max()) + J[3])
    skip_shift = np.stack([sk_d, sk_j], axis=1)

    # Ring storage extents: own cells plus what the next layer's taps read.
    store = []
    for li in range(4):
        dws = max(DW[li], int(d_shift[li].max()) + DW[li + 1])
        jss = max(J[li], int(j_shift[li].max()) + J[li + 1])
        store.append((dws, jss))
    store = tuple(store)

    # Lane mappings into the packed logits / q-row planes.
    act = base.active
    pos = base.positions
    j0_4, dlo_4 = _row_maps(grids[4])
    v4 = t_arr
    lane_plane = np.full((T, base.M), DW[4] * J[4], np.int32)
    rel_d = pos[..., 0] - dlo_4(v4)[:, None]
    jj = pos[..., 1] + 5 * pos[..., 0] - j0_4(v4)[:, None]
    lane_plane[act] = (rel_d[act] * J[4] + jj[act]).astype(np.int32)
    assert (rel_d[act] >= 0).all() and (rel_d[act] < DW[4]).all()
    assert (jj[act] >= 0).all() and (jj[act] < J[4]).all()

    j0_0, dlo_0 = _row_maps(grids[0])
    v0 = t_arr + _C[0]
    lane_q = np.full((T, base.M), DW[0] * J[0], np.int32)
    d0 = pos[..., 0] + p
    h0 = pos[..., 1] + p
    rel_d0 = d0 - dlo_0(v0)[:, None]
    jj0 = h0 + 5 * d0 - j0_0(v0)[:, None]
    lane_q[act] = (rel_d0[act] * J[0] + jj0[act]).astype(np.int32)
    assert (rel_d0[act] >= 0).all() and (rel_d0[act] < DW[0]).all()
    assert (jj0[act] >= 0).all() and (jj0[act] < J[0]).all()

    # Latent mask of the packed q-row plane.
    i_idx = np.arange(DW[0])[None, :, None]
    j_idx = np.arange(J[0])[None, None, :]
    d0_abs = dlo_0(v0)[:, None, None] + i_idx
    h0_abs = j_idx + j0_0(v0)[:, None, None] - 5 * d0_abs
    w0 = v0[:, None, None] - 25 * d0_abs - 5 * h0_abs
    q_latent = ((d0_abs >= p) & (d0_abs < p + C)
                & (h0_abs >= p) & (h0_abs < p + H)
                & (w0 >= p) & (w0 < p + W))
    return RingSchedule(base=base, DW=tuple(DW), J=tuple(J), store=store,
                        d_shift=tuple(d_shift), j_shift=tuple(j_shift),
                        skip_shift=skip_shift, lane_plane=lane_plane,
                        lane_q=lane_q, q_latent=q_latent)


def _pad_constants(pc, pc_params, pad_value):
    """(ch,) constant activation of each layer over an all-pad volume."""
    patch = jnp.full((1, 5, 11, 11), pad_value, jnp.float32)
    acts = pc.net.apply(pc_params, patch, return_activations=True)
    return (acts['l1'][0, 0, 0, 0], acts['l2'][0, 0, 0, 0],
            acts['l3'][0, 0, 0, 0])


class RingScanBuilder:
    def __init__(self, pc: pc_lib.ProbClassifier, pc_config,
                 cache_dtype=jnp.float32):
        self.pc = pc
        self.pc_config = pc_config
        self.k = pc_config.arch_param__k
        self.cache_dtype = cache_dtype
        assert pc_config.kernel_size == 3

    def make_run(self, latent_shape: Tuple[int, int, int]):
        rs = build_ring_schedule(latent_shape)
        sched = rs.base
        C, H, W = latent_shape
        kf = self.k
        L = self.pc.num_centers
        cdt = self.cache_dtype
        DW, J, store = rs.DW, rs.J, rs.store

        from .cached import _layer_weights

        xs = {
            'sym_idx': jnp.asarray(sched.sym_flat),
            'active': jnp.asarray(sched.active),
            'lane_plane': jnp.asarray(rs.lane_plane),
            'lane_q': jnp.asarray(rs.lane_q),
            'q_latent': jnp.asarray(rs.q_latent),
            'step_mod': jnp.asarray(np.arange(rs.base.T, dtype=np.int32) % VR),
            'skip_shift': jnp.asarray(rs.skip_shift),
        }
        for li in range(4):
            xs[f'dsh{li + 1}'] = jnp.asarray(rs.d_shift[li])
            xs[f'jsh{li + 1}'] = jnp.asarray(rs.j_shift[li])

        pc = self.pc
        pc_config = self.pc_config

        def ring_slab(ring, head_mod):
            """Rows [newest-31 .. newest+6] as one contiguous slab."""
            start = jnp.remainder(head_mod - 31, VR)
            sizes = (_SPAN,) + ring.shape[1:]
            return jax.lax.dynamic_slice(
                ring, (start,) + (0,) * (ring.ndim - 1), sizes)

        def ring_write(ring, head_mod, row):
            row = row[None].astype(ring.dtype)
            for base_idx in (head_mod, head_mod + VR):
                ring = jax.lax.dynamic_update_slice(
                    ring, row, (base_idx,) + (0,) * (ring.ndim - 1))
            return ring

        def taps_matmul(slab, dsh, jsh, d_out, j_out, w_mat, bias):
            """slab: (38, DWs, Js[, ch]) -> (d_out, j_out, ch_out)."""
            if slab.ndim == 3:
                slab = slab[..., None]
            ch = slab.shape[-1]
            cols = []
            for o, off in enumerate(_OFFS):
                cols.append(jax.lax.dynamic_slice(
                    slab, (off, dsh[o], jsh[o], 0),
                    (1, d_out, j_out, ch))[0])
            x = jnp.stack(cols, axis=2)          # (d_out, j_out, 18, ch)
            x = x.reshape(d_out, j_out, -1).astype(jnp.float32)
            return jnp.einsum('dhc,co->dho', x, w_mat) + bias

        @jax.jit
        def run(pc_params, centers, true_syms_flat, stream, init_states, mode):
            (w1, b1), (w2, b2), (w3, b3), (w4, b4) = _layer_weights(
                pc_params, kf, L)
            pad_value = pc_lib.auto_pad_value(pc_config, centers)
            k1, k2, k3 = _pad_constants(pc, pc_params, pad_value)

            r0 = jnp.full((2 * VR,) + store[0], pad_value, jnp.float32)
            r1 = jnp.broadcast_to(k1.astype(cdt), (2 * VR,) + store[1] + (kf,)) + 0
            r2 = jnp.broadcast_to(k2.astype(cdt), (2 * VR,) + store[2] + (kf,)) + 0
            r3 = jnp.broadcast_to(k3.astype(cdt), (2 * VR,) + store[3] + (kf,)) + 0

            def pad_plane(y, st, value=0.0):
                return jnp.pad(y, ((0, st[0] - y.shape[0]),
                                   (0, st[1] - y.shape[1])) + (((0, 0),)
                                                               if y.ndim == 3 else ()),
                               constant_values=value)

            def step(carry, x):
                r0, r1, r2, r3, states, gptr = carry
                hm = x['step_mod']
                y1 = jax.nn.relu(taps_matmul(
                    ring_slab(r0, hm), x['dsh1'], x['jsh1'], DW[1], J[1], w1, b1))
                r1 = ring_write(r1, hm, pad_plane(y1, store[1]))
                y2 = jax.nn.relu(taps_matmul(
                    ring_slab(r1, hm), x['dsh2'], x['jsh2'], DW[2], J[2], w2, b2))
                r2 = ring_write(r2, hm, pad_plane(y2, store[2]))
                skip = jax.lax.dynamic_slice(
                    y1, (x['skip_shift'][0], x['skip_shift'][1], 0),
                    (DW[3], J[3], kf))
                y3 = taps_matmul(
                    ring_slab(r2, hm), x['dsh3'], x['jsh3'], DW[3], J[3],
                    w3, b3) + skip
                r3 = ring_write(r3, hm, pad_plane(y3, store[3]))
                logits = jax.nn.relu(taps_matmul(
                    ring_slab(r3, hm), x['dsh4'], x['jsh4'], DW[4], J[4], w4, b4))

                lane_logits = logits.reshape(-1, L)[x['lane_plane']]   # (M, L)
                probs = jax.nn.softmax(lane_logits, axis=-1)
                freq, cdf_low = rans.quantize_cdf(probs)

                sym_dec, states, gptr = rans.decode_step_interleaved(
                    states, gptr, stream, freq, cdf_low, x['active'])
                sym_true = jnp.take(true_syms_flat, x['sym_idx']).astype(jnp.int32)
                sym = jnp.where(mode == 1, sym_true, sym_dec)
                sym = jnp.where(x['active'], sym, 0)

                # Packed q-row write: latent cells get decoded center values,
                # everything else (real padding + dead cells) gets pad_value.
                win_vals = jnp.zeros((DW[0] * J[0],), jnp.float32).at[
                    x['lane_q']].set(jnp.take(centers, sym), mode='drop')
                q_row = jnp.where(x['q_latent'], win_vals.reshape(DW[0], J[0]),
                                  pad_value)
                q_row = pad_plane(q_row, store[0], value=pad_value)
                r0 = ring_write(r0, hm, q_row)

                sel = sym[:, None].astype(jnp.int32)
                freq_sel = jnp.take_along_axis(freq, sel, axis=-1)[:, 0]
                start_sel = jnp.take_along_axis(cdf_low, sel, axis=-1)[:, 0]
                return (r0, r1, r2, r3, states, gptr), (
                    sym.astype(jnp.int8), freq_sel, start_sel)

            init = (r0, r1, r2, r3, init_states, jnp.zeros((), jnp.int32))
            (_, _, _, _, _, final_gptr), ys = jax.lax.scan(step, init, xs)
            syms, freq_sel, start_sel = ys
            return syms, freq_sel, start_sel, final_gptr

        return run, sched
