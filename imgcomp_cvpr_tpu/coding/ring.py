"""Ring-buffer wavefront codec — the production decode path.

Third and fastest formulation of the activation-cached wavefront scan
(after coding/cached.py's gather-based variant). Key observation: index
every cache cell by v = 25 d + 5 h + w. Then

- layer l writes EXACTLY ONE v-row per step: v_out = t + c_l with
  c_l = 31 * (4 - l)  (each conv layer shifts the window center by
  (1,1,1) in (d,h,w) => 25 + 5 + 1 = 31 steps);
- that row's (2,3,3) causal window reads v-rows [v_out, v_out + 37] of the
  previous layer, i.e. offsets [-31, +6] relative to that layer's newest
  row — *unmasked* taps only reach offset <= 0 (already written; the +1..+6
  rows are only touched by masked, zero-weight taps);
- within a v-row, only depths d with u = v - 25 d inside the grid hold
  valid cells (<= ceil((u_max+1)/25) ~ 19 of them) — compute is restricted
  to that d-window (start precomputed per step), stored as a dense
  (DW, H) plane slice; every tap is a STATIC slice of the windowed slab.

Each cache is a ring of the most recent 44 v-rows (stored twice,
ring[i] == ring[i + VR], so any 38-row window is one contiguous
dynamic_slice). One scan step is, per layer: 1 dynamic slice, 18 static
tap slices, one dense (DW*H, 18*ch) @ (18*ch, ch) MXU matmul, 2 windowed
ring writes. No gathers in the hot loop except the (M,)-lane compaction
for the rANS coder.

Pre-history rows (v < c_l) are pure functions of the constant padding
value; a VALID conv of a constant volume is constant, so they are one
(ch,) vector per layer, computed once per image on a tiny constant patch.
Cells outside a row's d-window are dead storage: valid outputs never read
them (a valid output's valid input cells lie inside the input row's own
window, which its write covered), and masked taps read finite garbage.

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
    DW: Tuple[int, ...]        # d-window widths for (q-write, L1..L4 outputs)
    d_lo: Tuple[np.ndarray, ...]   # (T,) int32 window starts, same order
    skip_off: np.ndarray       # (T,) int32 d-offset of the L3 residual skip in y1
    lane_plane: np.ndarray     # (T, M) int32: lane -> window-rel (d*H + h) in logits
    lane_q: np.ndarray         # (T, M) int32: lane -> window-rel (d0*H0 + h0) in q row
    q_latent: np.ndarray       # (T, DW0, H0) bool: latent cells of the q-row window


def _u_max(shape: Tuple[int, int, int]) -> int:
    return 5 * (shape[1] - 1) + shape[2] - 1


@functools.lru_cache(maxsize=8)
def build_ring_schedule(latent_shape: Tuple[int, int, int],
                        context_size: int = 9) -> RingSchedule:
    assert context_size == 9, 'ring codec is specialized to kernel_size=3'
    # The v-row algebra requires the *linear* step assignment t = 25d+5h+w
    # (ASAP happens to coincide for this geometry, but don't depend on it).
    base = wavefront.build_schedule(latent_shape, context_size, 'linear')
    C, H, W = latent_shape
    p = context_size // 2
    g0 = base.padded_shape
    g1 = (g0[0] - 1, g0[1] - 2, g0[2] - 2)
    g2 = (g1[0] - 1, g1[1] - 2, g1[2] - 2)
    g3 = (g2[0] - 1, g2[1] - 2, g2[2] - 2)
    g4 = (C, H, W)
    out_grids = (g0, g1, g2, g3, g4)   # q row writes into g0
    T = base.T
    t_arr = np.arange(T)

    DW, d_lo = [], []
    for grid, c in zip(out_grids, _C):
        um = _u_max(grid)
        dw = min(-(-(um + 1) // 25), grid[0])
        lo = np.clip(-(-(t_arr + c - um) // 25), 0, grid[0] - dw).astype(np.int32)
        DW.append(dw)
        d_lo.append(lo)

    # L3's residual skip reads this step's y1 at absolute depth d3 + 2.
    # Widen y1's window so it always covers both its own valid rows and the
    # skip range [d_lo3 + 2, d_lo3 + 2 + DW3).
    lo1e_unc = np.minimum(d_lo[1], d_lo[3] + 2)
    top1e = np.maximum(d_lo[1] + DW[1], d_lo[3] + 2 + DW[3])
    dw1e = min(int((top1e - lo1e_unc).max()), g1[0])
    lo1e = np.clip(lo1e_unc, 0, g1[0] - dw1e).astype(np.int32)
    assert (lo1e <= lo1e_unc).all() and (lo1e + dw1e >= top1e).all()
    DW[1] = dw1e
    d_lo[1] = lo1e
    DW = tuple(DW)
    d_lo = tuple(d_lo)

    skip_off = (d_lo[3] + 2 - d_lo[1]).astype(np.int32)
    assert (skip_off >= 0).all()
    assert (skip_off + DW[3] <= DW[1]).all(), 'skip slice exceeds y1 window'

    # Lane mappings (window-relative).
    act = base.active
    pos = base.positions
    d4lo = d_lo[4]
    lane_plane = np.full((T, base.M), DW[4] * H, np.int32)
    lane_q = np.full((T, base.M), DW[0] * g0[1], np.int32)
    rel_d = pos[..., 0] - d4lo[:, None]
    lane_plane[act] = (rel_d[act] * H + pos[..., 1][act]).astype(np.int32)
    rel_d0 = pos[..., 0] + p - d_lo[0][:, None]
    lane_q[act] = (rel_d0[act] * g0[1] + pos[..., 1][act] + p).astype(np.int32)
    assert (rel_d[act] >= 0).all() and (rel_d[act] < DW[4]).all()
    assert (rel_d0[act] >= 0).all() and (rel_d0[act] < DW[0]).all()

    # Latent-cell mask of the q-row window: cell (d0 = d_lo0 + i, h0) with
    # w0 = (t + 124) - 25 d0 - 5 h0 is latent iff every padded coord minus p
    # is inside the latent grid.
    i_idx = np.arange(DW[0])[None, :, None]
    h0 = np.arange(g0[1])[None, None, :]
    d0_abs = d_lo[0][:, None, None] + i_idx
    w0 = t_arr[:, None, None] + _C[0] - 25 * d0_abs - 5 * h0
    q_latent = ((d0_abs >= p) & (d0_abs < p + C) & (h0 >= p) & (h0 < p + H)
                & (w0 >= p) & (w0 < p + W))
    return RingSchedule(base=base, DW=DW, d_lo=d_lo, skip_off=skip_off,
                        lane_plane=lane_plane, lane_q=lane_q, q_latent=q_latent)


def _pad_constants(pc, pc_params, pad_value):
    """(ch,) constant activation of each layer over an all-pad volume
    (a VALID conv of a constant volume is constant). Patch is sized to
    the network's receptive field for any kernel_size."""
    K = pc.config.kernel_size
    kd = K // 2 + 1
    d = 4 * (kd - 1) + 1
    s = 4 * (K - 1) + 1 + 2
    patch = jnp.full((1, d, s, s), pad_value, jnp.float32)
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
        p = 4
        D0, H0, _ = sched.padded_shape
        D1, H1 = D0 - 1, H0 - 2
        D2, H2 = D1 - 1, H1 - 2
        D3, H3 = D2 - 1, H2 - 2
        assert (D3 - 1, H3 - 2) == (C, H)
        kf = self.k
        L = self.pc.num_centers
        cdt = self.cache_dtype
        DW0, DW1, DW2, DW3, DW4 = rs.DW

        from .cached import _layer_weights

        xs = {
            'sym_idx': jnp.asarray(sched.sym_flat),
            'active': jnp.asarray(sched.active),
            'lane_plane': jnp.asarray(rs.lane_plane),
            'lane_q': jnp.asarray(rs.lane_q),
            'q_latent': jnp.asarray(rs.q_latent),
            'step_mod': jnp.asarray(np.arange(rs.base.T, dtype=np.int32) % VR),
            'skip_off': jnp.asarray(rs.skip_off),
        }
        for i in range(5):
            xs[f'dlo{i}'] = jnp.asarray(rs.d_lo[i])

        pc = self.pc
        pc_config = self.pc_config

        def ring_read(ring, head_mod, d_start, dw):
            """Rows [newest-31 .. newest+6] x depth window as one slab."""
            start = jnp.remainder(head_mod - 31, VR)
            d_start = jnp.minimum(d_start, ring.shape[1] - dw)
            sizes = (_SPAN, dw) + ring.shape[2:]
            return jax.lax.dynamic_slice(
                ring, (start, d_start) + (0,) * (ring.ndim - 2), sizes)

        def ring_write(ring, head_mod, d_start, row):
            row = row[None].astype(ring.dtype)
            for base_idx in (head_mod, head_mod + VR):
                ring = jax.lax.dynamic_update_slice(
                    ring, row, (base_idx, d_start) + (0,) * (ring.ndim - 2))
            return ring

        def taps_matmul(slab, d_out, h_out, w_mat, bias):
            """slab: (38, d_out + 1, h_in[, ch]) -> (d_out, h_out, ch_out)."""
            if slab.ndim == 3:
                slab = slab[..., None]
            cols = [slab[off, dz:dz + d_out, dy:dy + h_out]
                    for off, (dz, dy, dx) in zip(_OFFS, _WINDOW)]
            x = jnp.stack(cols, axis=2)          # (d_out, h_out, 18, ch)
            x = x.reshape(d_out, h_out, -1).astype(jnp.float32)
            return jnp.einsum('dhc,co->dho', x, w_mat) + bias

        @jax.jit
        def run(pc_params, centers, true_syms_flat, stream, init_states, mode,
                thresh):
            (w1, b1), (w2, b2), (w3, b3), (w4, b4) = _layer_weights(
                pc_params, kf, L)
            pad_value = pc_lib.auto_pad_value(pc_config, centers, pc_params)
            k1, k2, k3 = _pad_constants(pc, pc_params, pad_value)

            r0 = jnp.full((2 * VR, D0, H0), pad_value, jnp.float32)
            r1 = jnp.broadcast_to(k1.astype(cdt), (2 * VR, D1, H1, kf)) + 0
            r2 = jnp.broadcast_to(k2.astype(cdt), (2 * VR, D2, H2, kf)) + 0
            r3 = jnp.broadcast_to(k3.astype(cdt), (2 * VR, D3, H3, kf)) + 0

            def step(carry, x):
                r0, r1, r2, r3, states, gptr, cnt = carry
                hm = x['step_mod']
                y1 = jax.nn.relu(taps_matmul(
                    ring_read(r0, hm, x['dlo1'], DW1 + 1), DW1, H1, w1, b1))
                r1 = ring_write(r1, hm, x['dlo1'], y1)
                y2 = jax.nn.relu(taps_matmul(
                    ring_read(r1, hm, x['dlo2'], DW2 + 1), DW2, H2, w2, b2))
                r2 = ring_write(r2, hm, x['dlo2'], y2)
                skip = jax.lax.dynamic_slice(
                    y1, (x['skip_off'], 2, 0), (DW3, H3, kf))
                y3 = taps_matmul(
                    ring_read(r2, hm, x['dlo3'], DW3 + 1), DW3, H3, w3, b3) + skip
                r3 = ring_write(r3, hm, x['dlo3'], y3)
                logits = jax.nn.relu(taps_matmul(
                    ring_read(r3, hm, x['dlo4'], DW4 + 1), DW4, H, w4, b4))

                lane_logits = logits.reshape(-1, L)[x['lane_plane']]   # (M, L)
                probs = jax.nn.softmax(lane_logits, axis=-1)
                freq, cdf_low = rans.quantize_cdf(probs)

                sym_dec, states, gptr, cnt = rans.decode_step_interleaved(
                    states, gptr, stream, freq, cdf_low, x['active'],
                    cnt, thresh)
                sym_true = jnp.take(true_syms_flat, x['sym_idx']).astype(jnp.int32)
                sym = jnp.where(mode == 1, sym_true, sym_dec)
                sym = jnp.where(x['active'], sym, 0)

                # Windowed q-row write: latent cells get decoded center
                # values, everything else in the window (incl. real padding
                # cells) gets pad_value.
                win_vals = jnp.zeros((DW0 * H0,), jnp.float32).at[
                    x['lane_q']].set(jnp.take(centers, sym), mode='drop')
                q_row = jnp.where(x['q_latent'], win_vals.reshape(DW0, H0),
                                  pad_value)
                r0 = ring_write(r0, hm, x['dlo0'], q_row)

                sel = sym[:, None].astype(jnp.int32)
                freq_sel = jnp.take_along_axis(freq, sel, axis=-1)[:, 0]
                start_sel = jnp.take_along_axis(cdf_low, sel, axis=-1)[:, 0]
                return (r0, r1, r2, r3, states, gptr, cnt), (
                    sym.astype(jnp.int8), freq_sel, start_sel)

            init = (r0, r1, r2, r3, init_states, jnp.zeros((), jnp.int32),
                    jnp.zeros_like(thresh))
            (_, _, _, _, _, final_gptr, _), ys = jax.lax.scan(step, init, xs)
            syms, freq_sel, start_sel = ys
            return syms, freq_sel, start_sel, final_gptr

        return run, sched
