"""Ring-buffer wavefront codec — the production decode path.

Third and fastest formulation of the activation-cached wavefront scan
(after coding/cached.py's gather-based and an earlier slot-sliced variant).
Key observation: index every cache cell by v = 25 d + 5 h + w. Then

- layer l writes EXACTLY ONE v-row per step: v_out = t + c_l with
  c_l = 31 * (4 - l)  (each conv layer shifts the window center by
  (1,1,1) in (d,h,w) => 25 + 5 + 1 = 31 steps);
- that row's (2,3,3) causal window reads v-rows [v_out, v_out + 37] of the
  previous layer, i.e. offsets [-31, +6] relative to that layer's newest
  row — *unmasked* taps only reach offset <= 0 (already written; the +1..+6
  rows are only touched by masked, zero-weight taps);
- within a v-row, cells are laid out as a dense (D_l, H_l) plane; every tap
  is then a STATIC slice [off, dz : dz + D_out, dy : dy + H_out].

So each cache is a ring of the most recent 44 v-rows (stored twice,
ring[i] == ring[i + VR], so any 38-row window is one contiguous
dynamic_slice), and one scan step is, per layer: 1 dynamic slice,
18 static tap slices, one dense (D*H, 18*ch) @ (18*ch, ch) MXU matmul,
2 ring writes. No gathers anywhere in the hot loop except the (M,)-lane
compaction for the rANS coder.

Pre-history rows (v < c_l) are pure functions of the constant padding
value; since a VALID conv of a constant volume is constant, they are a
single (ch,) vector per layer, computed once per image by running the
network on a tiny constant patch.

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
_C0 = 124                        # q-volume row constant: c_0 = 31 * 4


class RingSchedule(NamedTuple):
    base: wavefront.Schedule
    lane_plane: np.ndarray   # (T, M) int32: lane -> d*H + h (C*H if inactive)
    q_valid: np.ndarray      # (T, D0, H0) bool: latent-valid cells of the q row
    q_w: np.ndarray          # (T, D0, H0) int32 (unused placeholder for debug)


@functools.lru_cache(maxsize=8)
def build_ring_schedule(latent_shape: Tuple[int, int, int],
                        context_size: int = 9) -> RingSchedule:
    assert context_size == 9, 'ring codec is specialized to kernel_size=3'
    base = wavefront.build_schedule(latent_shape, context_size)
    C, H, W = latent_shape
    p = context_size // 2
    D0, H0, W0 = base.padded_shape
    T = base.T

    lane_plane = np.full((T, base.M), C * H, np.int32)
    act = base.active
    pos = base.positions
    lane_plane[act] = pos[..., 0][act] * H + pos[..., 1][act]

    # q-volume row at step t is v0 = t + 124; cell (d0, h0) of that row has
    # w0 = v0 - 25 d0 - 5 h0; it is a latent cell iff all padded coords minus
    # p land inside the latent grid.
    t_idx = np.arange(T)[:, None, None]
    d0 = np.arange(D0)[None, :, None]
    h0 = np.arange(H0)[None, None, :]
    w0 = t_idx + _C0 - 25 * d0 - 5 * h0
    q_valid = ((d0 >= p) & (d0 < p + C) & (h0 >= p) & (h0 < p + H)
               & (w0 >= p) & (w0 < p + W))
    return RingSchedule(base=base, lane_plane=lane_plane,
                        q_valid=q_valid, q_w=np.zeros((1,), np.int32))


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
        p = 4
        D0, H0, W0 = sched.padded_shape
        # layer plane shapes (VALID shrink per layer)
        D1, H1 = D0 - 1, H0 - 2
        D2, H2 = D1 - 1, H1 - 2
        D3, H3 = D2 - 1, H2 - 2
        assert (D3 - 1, H3 - 2) == (C, H)
        kf = self.k
        L = self.pc.num_centers
        cdt = self.cache_dtype

        from .cached import _layer_weights

        xs = {
            'sym_idx': jnp.asarray(sched.sym_flat),
            'active': jnp.asarray(sched.active),
            'lane_plane': jnp.asarray(rs.lane_plane),
            'q_valid': jnp.asarray(rs.q_valid),
            'step_mod': jnp.asarray(np.arange(rs.base.T, dtype=np.int32) % VR),
        }
        pc = self.pc
        pc_config = self.pc_config

        def ring_read(ring, head_mod):
            """Rows [newest-31 .. newest+6] as one contiguous (38, ...) slab.

            ring row (v mod VR) holds v; duplicated at +VR. newest = head;
            we want start = (head - 31) mod VR.
            """
            start = jnp.remainder(head_mod - 31, VR)
            sizes = (_SPAN,) + ring.shape[1:]
            return jax.lax.dynamic_slice(
                ring, (start,) + (0,) * (ring.ndim - 1), sizes)

        def ring_write(ring, head_mod, row):
            row = row[None].astype(ring.dtype)
            ring = jax.lax.dynamic_update_slice(
                ring, row, (head_mod,) + (0,) * (ring.ndim - 1))
            ring = jax.lax.dynamic_update_slice(
                ring, row, (head_mod + VR,) + (0,) * (ring.ndim - 1))
            return ring

        def taps_matmul(slab, d_out, h_out, w_mat, bias):
            """slab: (38, D_in, H_in[, ch]) -> (d_out, h_out, ch_out)."""
            if slab.ndim == 3:
                slab = slab[..., None]
            cols = [slab[off, dz:dz + d_out, dy:dy + h_out]
                    for off, (dz, dy, dx) in zip(_OFFS, _WINDOW)]
            x = jnp.stack(cols, axis=2)          # (d_out, h_out, 18, ch)
            x = x.reshape(d_out, h_out, -1).astype(jnp.float32)
            return jnp.einsum('dhc,co->dho', x, w_mat) + bias

        @jax.jit
        def run(pc_params, centers, true_syms_flat, streams, init_states, mode):
            (w1, b1), (w2, b2), (w3, b3), (w4, b4) = _layer_weights(
                pc_params, kf, L)
            pad_value = pc_lib.auto_pad_value(pc_config, centers)
            k1, k2, k3 = _pad_constants(pc, pc_params, pad_value)

            r0 = jnp.full((2 * VR, D0, H0), pad_value, jnp.float32)
            r1 = jnp.broadcast_to(k1.astype(cdt), (2 * VR, D1, H1, kf)) + 0
            r2 = jnp.broadcast_to(k2.astype(cdt), (2 * VR, D2, H2, kf)) + 0
            r3 = jnp.broadcast_to(k3.astype(cdt), (2 * VR, D3, H3, kf)) + 0

            def step(carry, x):
                r0, r1, r2, r3, states, ptrs = carry
                hm = x['step_mod']
                # One v-row per layer: heads advance in lockstep, so each
                # ring's newest row is at this step's (t mod VR).
                y1 = jax.nn.relu(taps_matmul(ring_read(r0, hm), D1, H1, w1, b1))
                r1 = ring_write(r1, hm, y1)
                y2 = jax.nn.relu(taps_matmul(ring_read(r1, hm), D2, H2, w2, b2))
                r2 = ring_write(r2, hm, y2)
                # L3 residual skip = this step's L1 row at (d+2, h+2).
                y3 = taps_matmul(ring_read(r2, hm), D3, H3, w3, b3) \
                    + y1[2:2 + D3, 2:2 + H3]
                r3 = ring_write(r3, hm, y3)
                logits = jax.nn.relu(taps_matmul(ring_read(r3, hm), C, H, w4, b4))

                lane_logits = logits.reshape(-1, L)[x['lane_plane']]   # (M, L)
                probs = jax.nn.softmax(lane_logits, axis=-1)
                freq, cdf_low = rans.quantize_cdf(probs)

                sym_dec, states, ptrs = rans.decode_step(
                    states, ptrs, streams, freq, cdf_low, x['active'])
                sym_true = jnp.take(true_syms_flat, x['sym_idx'])
                sym = jnp.where(mode == 1, sym_true, sym_dec)
                sym = jnp.where(x['active'], sym, 0)

                plane_vals = jnp.zeros((C * H,), jnp.float32).at[
                    x['lane_plane']].set(jnp.take(centers, sym), mode='drop')
                plane_vals = jnp.pad(plane_vals.reshape(C, H),
                                     ((p, 0), (p, p)))          # (D0, H0)
                q_row = jnp.where(x['q_valid'], plane_vals, pad_value)
                r0 = ring_write(r0, hm, q_row)

                sel = sym[:, None].astype(jnp.int32)
                freq_sel = jnp.take_along_axis(freq, sel, axis=-1)[:, 0]
                start_sel = jnp.take_along_axis(cdf_low, sel, axis=-1)[:, 0]
                return (r0, r1, r2, r3, states, ptrs), (
                    sym.astype(jnp.int8), freq_sel, start_sel)

            init = (r0, r1, r2, r3, init_states,
                    jnp.zeros((sched.M,), jnp.int32))
            (_, _, _, _, _, final_ptrs), ys = jax.lax.scan(step, init, xs)
            syms, freq_sel, start_sel = ys
            return syms, freq_sel, start_sel, final_ptrs

        return run, sched
