"""Slab-structured ("skewed") activation-cached wavefront codec.

The gather-based cached codec (cached.py) is bound by TPU gather throughput
(~4-5 GB/s effective). This implementation removes gathers from the hot
loop entirely by storing the q volume and every layer cache in *skewed*
coordinates ``A[d, u, h]`` with ``u = 5h + w``:

- the wavefront step t touches, per depth d, exactly the row u = t - 25d
  (+ a per-layer constant) — a contiguous slab;
- a (2,3,3) causal conv window of an output row (d, u) reads input rows
  [u, u+8] of depths {d, d+1} — two `lax.dynamic_slice`s per depth slot
  (~8 ns each on v5e, vs ~100s of us for the equivalent gather);
- each layer update is then ONE dense (slots*H, 18*ch) @ (18*ch, ch)
  matmul on the MXU.

Scheduling: layer-l row (d, u) is computed at step s_l = 25d + u - c_l with
c_l = 31*(4-l) (each layer shifts the window center by (1,1,1) => 25+5+1).
The max causal-cone step of any position in the row is s_l - 1 for
cross-layer deps and s_l for the same-position center tap, which is
produced by the previous layer earlier in the same step — so within-step
layer ordering (L1 -> L2 -> L3 -> logits -> decode -> q-write) makes the
linear schedule exact. Rows with s_l < 0 depend only on padding and are
seeded by a one-time full conv pass over the constant-pad volume.

Cells of A[d, u, h] with w = u - 5h outside the grid are dead storage
(~20% inflation): conv windows of valid outputs never read them, and row
writes may clobber them freely. The q-volume write masks decoded values
with the pad value so real padding cells are preserved.

Bit-exactness: identical strategy to codec.py — one executable, traced
encode/decode mode flag.
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
_SKEW = 5          # u = _SKEW * h + w; = p + 1 for context size 9
_DEPTH_COEF = 25   # wavefront depth coefficient (p + 1)^2
_CENTER_SHIFT = 31  # 25 + 5 + 1: step shift of the window center per layer


class SkewedSchedule(NamedTuple):
    base: wavefront.Schedule
    grid_shapes: Tuple[Tuple[int, int, int], ...]  # G0..G3 (d, h, w) shapes
    u_rows: Tuple[int, ...]        # allocated u rows per grid (incl. slack+garbage)
    layer_S: Tuple[int, ...]       # slots per step for layers 1..4
    slot_d: Tuple[np.ndarray, ...]     # (T, S_l) int32 per layer 1..4
    slot_u: Tuple[np.ndarray, ...]     # (T, S_l) int32 (garbage row if inactive)
    slot_act: Tuple[np.ndarray, ...]   # (T, S_l) bool
    lane_slab: np.ndarray          # (T, M) int32 index into S4*H logit slab
    a0_d: np.ndarray               # (T, S4) int32 q-volume write depth (d+pad)
    a0_u: np.ndarray               # (T, S4) int32 q-volume write row (garbage if off)
    a0_valid: np.ndarray           # (T, S4, Hp) bool: latent-valid cells of the row


def _u_max(shape: Tuple[int, int, int]) -> int:
    return _SKEW * (shape[1] - 1) + shape[2] - 1


@functools.lru_cache(maxsize=8)
def build_skewed_schedule(latent_shape: Tuple[int, int, int],
                          context_size: int = 9) -> SkewedSchedule:
    assert context_size == 9, 'skewed codec is specialized to kernel_size=3'
    base = wavefront.build_schedule(latent_shape, context_size)
    C, H, W = latent_shape
    p = context_size // 2
    g0 = base.padded_shape
    g1 = (g0[0] - 1, g0[1] - 2, g0[2] - 2)
    g2 = (g1[0] - 1, g1[1] - 2, g1[2] - 2)
    g3 = (g2[0] - 1, g2[1] - 2, g2[2] - 2)
    grids = (g0, g1, g2, g3)
    T = base.T

    # Layer row schedules: s_l(d, u) = 25 d + u - c_l.
    slot_d, slot_u, slot_act, layer_S = [], [], [], []
    layer_grids = (g1, g2, g3, (C, H, W))
    cs_consts = (3 * _CENTER_SHIFT, 2 * _CENTER_SHIFT, _CENTER_SHIFT, 0)
    u_rows = tuple(_u_max(g) + 1 + 8 + 1 for g in grids)
    out_rows = tuple(_u_max(g) + 1 + 8 + 1
                     for g in (g1, g2, g3, (C, H, W)))
    for li, (grid, c_l) in enumerate(zip(layer_grids, cs_consts)):
        d_grid, u_max = grid[0], _u_max(grid)
        garbage = out_rows[li] - 1
        per_step = []
        S = 0
        for t in range(T):
            slots = []
            for d in range(d_grid):
                u = t + c_l - _DEPTH_COEF * d
                if 0 <= u <= u_max:
                    slots.append((d, u))
            per_step.append(slots)
            S = max(S, len(slots))
        S = max(S, 1)
        sd = np.zeros((T, S), np.int32)
        su = np.full((T, S), garbage, np.int32)
        sa = np.zeros((T, S), bool)
        for t, slots in enumerate(per_step):
            for i, (d, u) in enumerate(slots):
                sd[t, i], su[t, i], sa[t, i] = d, u, True
        slot_d.append(sd)
        slot_u.append(su)
        slot_act.append(sa)
        layer_S.append(S)

    # Lane -> logits-slab mapping. base.positions for step t are sorted by
    # (d, h, w); slot order is d-ascending, so slot index = rank of d.
    S4 = layer_S[3]
    lane_slab = np.zeros((T, base.M), np.int32)
    a0_d = np.zeros((T, S4), np.int32)
    a0_u = np.full((T, S4), u_rows[0] - 1, np.int32)
    Hp = g0[1]
    a0_valid = np.zeros((T, S4, Hp), bool)
    for t in range(T):
        d_to_slot = {d: i for i, d in enumerate(sorted(
            int(d) for d in np.unique(slot_d[3][t][slot_act[3][t]])))}
        # sanity: slot arrays are already d-sorted by construction
        for i in range(S4):
            if slot_act[3][t][i]:
                assert d_to_slot[int(slot_d[3][t][i])] == i
        for j in range(base.M):
            if base.active[t, j]:
                d, h, w = base.positions[t, j]
                lane_slab[t, j] = d_to_slot[int(d)] * H + int(h)
            else:
                lane_slab[t, j] = S4 * H  # out of bounds -> dropped scatter
        for i in range(S4):
            if not slot_act[3][t][i]:
                continue
            d, u = int(slot_d[3][t][i]), int(slot_u[3][t][i])
            a0_d[t, i] = d + p
            a0_u[t, i] = u + _SKEW * p + p  # u0 = 5(h+p) + (w+p) = u + 6p
            for h in range(H):
                if 0 <= u - _SKEW * h < W:
                    a0_valid[t, i, h + p] = True
    return SkewedSchedule(base=base, grid_shapes=grids, u_rows=u_rows,
                          layer_S=tuple(layer_S),
                          slot_d=tuple(slot_d), slot_u=tuple(slot_u),
                          slot_act=tuple(slot_act), lane_slab=lane_slab,
                          a0_d=a0_d, a0_u=a0_u, a0_valid=a0_valid)


# ---------------------------------------------------------------------------


def _to_skewed(vol_dhw: jax.Array, u_rows: int) -> jax.Array:
    """(D, Hg, Wg[, ch]) grid -> (D, u_rows, Hg[, ch]) skewed layout:
    out[d, 5h + w, h] = vol[d, h, w] (the u range of a fixed h is
    contiguous, so one update-slice per h)."""
    d, hg, wg = vol_dhw.shape[:3]
    trailing = vol_dhw.shape[3:]
    out = jnp.zeros((d, u_rows, hg) + trailing, vol_dhw.dtype)
    for h in range(hg):
        blk = jnp.expand_dims(vol_dhw[:, h], 2)  # (D, Wg, 1[, ch])
        out = jax.lax.dynamic_update_slice(
            out, blk, (0, _SKEW * h, h) + (0,) * len(trailing))
    return out


class SkewedScanBuilder:
    def __init__(self, pc: pc_lib.ProbClassifier, pc_config,
                 cache_dtype=jnp.bfloat16):
        self.pc = pc
        self.pc_config = pc_config
        self.k = pc_config.arch_param__k
        self.cache_dtype = cache_dtype
        assert pc_config.kernel_size == 3

    def make_run(self, latent_shape: Tuple[int, int, int]):
        ss = build_skewed_schedule(latent_shape)
        sched = ss.base
        C, H, W = latent_shape
        p = 4
        g0, g1, g2, g3 = ss.grid_shapes
        kf = self.k
        L = self.pc.num_centers
        cache_dtype = self.cache_dtype

        from .cached import _layer_weights  # shared weight folding

        xs = {
            'sym_idx': jnp.asarray(sched.sym_flat),
            'active': jnp.asarray(sched.active),
            'lane_slab': jnp.asarray(ss.lane_slab),
            'a0_d': jnp.asarray(ss.a0_d),
            'a0_u': jnp.asarray(ss.a0_u),
            'a0_valid': jnp.asarray(ss.a0_valid),
        }
        for li in range(4):
            xs[f's{li}_d'] = jnp.asarray(ss.slot_d[li])
            xs[f's{li}_u'] = jnp.asarray(ss.slot_u[li])
            xs[f's{li}_a'] = jnp.asarray(ss.slot_act[li])

        pc = self.pc
        pc_config = self.pc_config
        u0_rows, u1_rows, u2_rows, u3_rows = ss.u_rows

        def layer_apply(src, d_slots, u_slots, h_in, w_mat, bias, act,
                        skip_vals=None):
            """src: (D, U, h_in[, ch]); returns (S, h_in - 2, ch_out)."""
            has_ch = src.ndim == 4
            ch = src.shape[-1] if has_ch else 1

            def one_slab(d, u):
                if has_ch:
                    return jax.lax.dynamic_slice(
                        src, (d, u, 0, 0), (2, 9, h_in, ch))
                sl = jax.lax.dynamic_slice(src, (d, u, 0), (2, 9, h_in))
                return sl[..., None]

            slabs = jax.vmap(one_slab)(d_slots, u_slots)  # (S, 2, 9, h_in, ch)
            h_out = h_in - 2
            cols = []
            for (dz, dy, dx) in _WINDOW:
                cols.append(slabs[:, dz, _SKEW * dy + dx, dy:dy + h_out, :])
            x = jnp.stack(cols, axis=2)                    # (S, h_out, 18, ch)
            x = x.reshape(x.shape[0], h_out, 18 * ch).astype(jnp.float32)
            y = jnp.einsum('shc,co->sho', x, w_mat) + bias
            if skip_vals is not None:
                y = y + skip_vals
            if act:
                y = jax.nn.relu(y)
            return y                                       # (S, h_out, ch_out)

        def write_rows(dst, y, d_slots, u_slots):
            """dst: (D, U, h[, ch]) <- y (S, h, ch) rows at (d, u)."""
            def one(dst, i):
                blk = y[i][None, None].astype(dst.dtype)   # (1, 1, h, ch)
                return jax.lax.dynamic_update_slice(
                    dst, blk, (d_slots[i], u_slots[i], 0, 0))
            for i in range(y.shape[0]):
                dst = one(dst, i)
            return dst

        @jax.jit
        def run(pc_params, centers, true_syms_flat, streams, init_states, mode):
            (w1, b1), (w2, b2), (w3, b3), (w4, b4) = _layer_weights(
                pc_params, kf, L)
            pad_value = pc_lib.auto_pad_value(pc_config, centers)

            # Seed caches: full conv pass over the constant-pad volume, then
            # skew. Rows scheduled in-scan overwrite everything that depends
            # on image content.
            pad_vol = jnp.full((1,) + g0, pad_value, jnp.float32)
            acts = pc.net.apply(pc_params, pad_vol, return_activations=True)
            a0 = jnp.full((g0[0], u0_rows, g0[1]), pad_value, jnp.float32)
            c1 = _to_skewed(acts['l1'][0], u1_rows).astype(cache_dtype)
            c2 = _to_skewed(acts['l2'][0], u2_rows).astype(cache_dtype)
            c3 = _to_skewed(acts['l3'][0], u3_rows).astype(cache_dtype)

            def step(carry, x):
                a0, c1, c2, c3, states, ptrs = carry
                # L1: source is the scalar q volume.
                y1 = layer_apply(a0, x['s0_d'], x['s0_u'], g0[1], w1, b1,
                                 act=True)
                c1 = write_rows(c1, y1, x['s0_d'], x['s0_u'])
                # L2
                y2 = layer_apply(c1, x['s1_d'], x['s1_u'], g1[1], w2, b2,
                                 act=True)
                c2 = write_rows(c2, y2, x['s1_d'], x['s1_u'])
                # L3 + residual skip: C1[d+2, u+12, 2 : 2+h_out]
                def skip_slab(d, u):
                    return jax.lax.dynamic_slice(
                        c1, (d + 2, u + 2 * _SKEW + 2, 2, 0),
                        (1, 1, g2[1] - 2, kf))[0, 0]
                skip = jax.vmap(skip_slab)(x['s2_d'], x['s2_u']).astype(jnp.float32)
                y3 = layer_apply(c2, x['s2_d'], x['s2_u'], g2[1], w3, b3,
                                 act=False, skip_vals=skip)
                c3 = write_rows(c3, y3, x['s2_d'], x['s2_u'])
                # L4: logits slab (S4, H, L), ReLU'd like the reference.
                logits = layer_apply(c3, x['s3_d'], x['s3_u'], g3[1], w4, b4,
                                     act=True)
                lane_logits = logits.reshape(-1, L)[x['lane_slab']]  # (M, L)
                probs = jax.nn.softmax(lane_logits, axis=-1)
                freq, cdf_low = rans.quantize_cdf(probs)

                sym_dec, states, ptrs = rans.decode_step(
                    states, ptrs, streams, freq, cdf_low, x['active'])
                sym_true = jnp.take(true_syms_flat, x['sym_idx'])
                sym = jnp.where(mode == 1, sym_true, sym_dec)
                sym = jnp.where(x['active'], sym, 0)

                # Write decoded center values back into the skewed q volume.
                slab_vals = jnp.zeros((logits.shape[0] * H,), jnp.float32)
                slab_vals = slab_vals.at[x['lane_slab']].set(
                    jnp.where(x['active'], jnp.take(centers, sym), 0.0),
                    mode='drop')
                slab_vals = slab_vals.reshape(logits.shape[0], H)
                row_vals = jnp.pad(slab_vals, ((0, 0), (p, p)))       # h -> h0
                row_vals = jnp.where(x['a0_valid'], row_vals, pad_value)

                def a0_write(a0, i):
                    return jax.lax.dynamic_update_slice(
                        a0, row_vals[i][None, None], (x['a0_d'][i], x['a0_u'][i], 0))
                for i in range(row_vals.shape[0]):
                    a0 = a0_write(a0, i)

                sel = sym[:, None].astype(jnp.int32)
                freq_sel = jnp.take_along_axis(freq, sel, axis=-1)[:, 0]
                start_sel = jnp.take_along_axis(cdf_low, sel, axis=-1)[:, 0]
                return (a0, c1, c2, c3, states, ptrs), (
                    sym.astype(jnp.int8), freq_sel, start_sel)

            init = (a0, c1, c2, c3, init_states,
                    jnp.zeros((sched.M,), jnp.int32))
            (_, _, _, _, _, final_ptrs), ys = jax.lax.scan(step, init, xs)
            syms, freq_sel, start_sel = ys
            return syms, freq_sel, start_sel, final_ptrs

        return run, sched
