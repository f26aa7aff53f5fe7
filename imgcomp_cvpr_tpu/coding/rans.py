"""Interleaved rANS primitives.

The reference entropy-codes with a sequential 32-bit arithmetic coder fed
one frequency table per symbol via a sess.run each (ref:
arithmetic_coding.py:80-115, bit_counter.py:124-134; ~350 s/image). The
TPU-native design replaces it with M independent rANS streams ("lanes"),
one per wavefront slot, so the whole decode runs vectorized on device:

- state: uint32 in [2^16, 2^32); 16-bit renormalization words;
- probabilities quantized to freq tables summing to 2^16 (SCALE_BITS=16);
- encode runs in *reverse* symbol order per lane (LIFO), decode forward —
  which matches the autoregressive direction: CDFs become available
  front-to-back, exactly when the decoder needs them;
- at most one renorm word per symbol in either direction, so a (M, T)
  uint16 buffer statically bounds any stream.

`quantize_cdf` is pure jnp and runs inside the decode scan; its encode-side
twin is the *same compiled code* (coding/codec.py), which is what makes the
float->integer CDF mapping bit-exact between encode and decode.

Production format (container v3) is the interleaved single-stream variant
(decode_step_interleaved / encode_reverse_scan_interleaved, both on
device). The per-lane-stream functions further down (scalar/numpy/C++ via
encode_reverse) are retained as reference implementations and unit-test
oracles for the rANS math itself.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SCALE_BITS = 16
SCALE = 1 << SCALE_BITS          # total frequency
RANS_L = 1 << 16                 # lower bound of the state interval
WORD_BITS = 16
WORD_MASK = (1 << WORD_BITS) - 1


# ---------------------------------------------------------------------------
# CDF quantization (jnp; also usable with numpy inputs via jnp)
# ---------------------------------------------------------------------------

def quantize_cdf(probs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., L) float probs -> (freq, cdf_low) uint32 with sum(freq) == SCALE.

    Deterministic: floor(p * (SCALE - L)) + 1 per symbol (guarantees
    freq >= 1, the reference's np.maximum(f, 1), ref probclass.py:474),
    remainder assigned to the argmax symbol.
    """
    L = probs.shape[-1]
    scaled = jnp.floor(probs * (SCALE - L)).astype(jnp.int32) + 1
    deficit = SCALE - jnp.sum(scaled, axis=-1, keepdims=True)      # may be ±small
    am = jnp.argmax(probs, axis=-1, keepdims=True)
    onehot = (jnp.arange(L, dtype=jnp.int32) == am).astype(jnp.int32)
    freq = (scaled + onehot * deficit).astype(jnp.uint32)
    cdf_low = jnp.cumsum(freq, axis=-1, dtype=jnp.uint32) - freq
    return freq, cdf_low


# ---------------------------------------------------------------------------
# Scalar reference codec (numpy) — test oracle for the vectorized paths
# ---------------------------------------------------------------------------

def scalar_encode(symbols: np.ndarray, freqs: np.ndarray, cdf_lows: np.ndarray,
                  x0: int = RANS_L) -> Tuple[List[int], int, int]:
    """Encode one lane. symbols: (N,), freqs/cdf_lows: (N, L) per-symbol
    tables. Returns (words in decode-read order, final_state, k).

    x0 < RANS_L enables TAIL PACKING: the classic rANS seed x0 = RANS_L
    injects 16 a-priori-known bits that flow out of the channel as ~one
    extra renorm word per lane. Seeding at x0 = 1 instead removes that
    waste; the price is a per-lane WARMUP of k symbols (the encoder's
    first k, i.e. the decoder's LAST k) during which the state sits below
    RANS_L and no renorm word is ever emitted — the decoder must suppress
    its `x < RANS_L` pull test for exactly those symbols, so k is
    transmitted (container v8). Warmup is a prefix by construction: once
    the state crosses RANS_L it never drops below it between symbols."""
    x = x0
    k = 0
    emitted: List[int] = []
    for i in range(len(symbols) - 1, -1, -1):
        s = int(symbols[i])
        f = int(freqs[i, s])
        start = int(cdf_lows[i, s])
        if x < RANS_L:
            k += 1          # warmup symbol: emission below is impossible
        if x >= (f << WORD_BITS):
            emitted.append(x & WORD_MASK)
            x >>= WORD_BITS
        x = ((x // f) << SCALE_BITS) + (x % f) + start
        assert 1 <= x < (1 << 32)
        assert x0 < RANS_L or x >= RANS_L
    return emitted[::-1], x, k


def scalar_decode(words: List[int], state: int, freqs: np.ndarray,
                  cdf_lows: np.ndarray, k: int = 0) -> np.ndarray:
    """Decode one lane of len(freqs) symbols. k = the encoder's warmup
    length: the pull test is suppressed for the lane's last k symbols
    (see scalar_encode). k=0 reproduces the classic x0=RANS_L decoder."""
    x = state
    pos = 0
    n = freqs.shape[0]
    out = []
    for i in range(n):
        slot = x & (SCALE - 1)
        s = int(np.sum(cdf_lows[i] <= slot)) - 1
        out.append(s)
        x = int(freqs[i, s]) * (x >> SCALE_BITS) + slot - int(cdf_lows[i, s])
        if x < RANS_L and i < n - k:
            w = words[pos] if pos < len(words) else 0
            pos += 1
            x = (x << WORD_BITS) | w
    return np.asarray(out, np.int32)


# ---------------------------------------------------------------------------
# Vectorized reverse encoder (numpy, all lanes at once)
# ---------------------------------------------------------------------------

def vectorized_encode(sym_sel_freq: np.ndarray, sym_sel_start: np.ndarray,
                      active: np.ndarray, x0: int = RANS_L
                      ) -> Tuple[List[np.ndarray], np.ndarray, np.ndarray]:
    """Encode M lanes over T steps.

    sym_sel_freq/sym_sel_start: (T, M) uint32 — freq and cdf_low of the coded
    symbol at each (step, lane); active: (T, M) bool. Returns
    (per-lane word arrays in decode-read order, final states (M,) uint32,
    warmup counts k (M,) int32 — see scalar_encode on tail packing).
    """
    T, M = sym_sel_freq.shape
    x = np.full(M, x0, np.uint64)
    k = np.zeros(M, np.int32)
    emitted: List[List[int]] = [[] for _ in range(M)]
    for t in range(T - 1, -1, -1):
        a = active[t]
        f = sym_sel_freq[t].astype(np.uint64)
        start = sym_sel_start[t].astype(np.uint64)
        f_safe = np.where(a, np.maximum(f, 1), 1)
        k += (a & (x < RANS_L)).astype(np.int32)
        emit = a & (x >= (f_safe << WORD_BITS))
        if emit.any():
            words = (x & WORD_MASK).astype(np.uint32)
            for j in np.nonzero(emit)[0]:
                emitted[j].append(int(words[j]))
        x = np.where(emit, x >> WORD_BITS, x)
        x_new = ((x // f_safe) << SCALE_BITS) + (x % f_safe) + start
        x = np.where(a, x_new, x)
    streams = [np.asarray(e[::-1], np.uint32) for e in emitted]
    return streams, x.astype(np.uint32), k


def encode_reverse(sym_sel_freq: np.ndarray, sym_sel_start: np.ndarray,
                   active: np.ndarray, x0: int = RANS_L
                   ) -> Tuple[List[np.ndarray], np.ndarray, np.ndarray]:
    """Reverse interleaved encode; dispatches to the native C++ runtime
    (coding/native/rans.cpp) when buildable, else the numpy oracle.
    Returns (streams, final states, warmup counts k)."""
    from .native import build as native_build
    lib = native_build.get_lib()
    if lib is None:
        return vectorized_encode(sym_sel_freq, sym_sel_start, active, x0)
    import ctypes
    T, M = sym_sel_freq.shape
    freqs = np.ascontiguousarray(sym_sel_freq, np.uint32)
    starts = np.ascontiguousarray(sym_sel_start, np.uint32)
    act = np.ascontiguousarray(active, np.uint8)
    out_words = np.zeros((M, T), np.uint16)
    out_lens = np.zeros((M,), np.uint32)
    out_states = np.zeros((M,), np.uint32)
    out_k = np.zeros((M,), np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.rans_encode_reverse(
        T, M, p(freqs, ctypes.c_uint32), p(starts, ctypes.c_uint32),
        p(act, ctypes.c_uint8), x0, p(out_words, ctypes.c_uint16),
        p(out_lens, ctypes.c_uint32), p(out_states, ctypes.c_uint32),
        p(out_k, ctypes.c_int32))
    streams = [out_words[j, :out_lens[j]].astype(np.uint32) for j in range(M)]
    return streams, out_states, out_k


def encode_reverse_scan(freq_sel: jax.Array, start_sel: jax.Array,
                        active: jax.Array):
    """On-device reverse interleaved encode (jnp, reversed lax.scan).

    freq_sel/start_sel: (T, M) uint32, active: (T, M) bool — the tables the
    forward codec scan produced, consumed WITHOUT a host roundtrip (the
    host<->device tunnel is far slower than the scan itself). Returns
    (words (M, T) uint32 in *emission* order, counts (M,), states (M,));
    per-lane decode-order streams are words[j, :counts[j]][::-1].
    Bit-identical to the C++/numpy encoders (tested)."""
    T, M = freq_sel.shape

    def step(carry, x):
        states, wptr, buf = carry
        f, s, a = x
        f = jnp.maximum(f, jnp.uint32(1))
        emit = a & (states >= (f << WORD_BITS))
        word = states & jnp.uint32(WORD_MASK)
        idx = jnp.where(emit, wptr, T)
        buf = buf.at[jnp.arange(M), idx].set(word, mode='drop')
        states = jnp.where(emit, states >> WORD_BITS, states)
        x_new = ((states // f) << SCALE_BITS) + (states % f) + s
        states = jnp.where(a, x_new, states)
        wptr = wptr + emit.astype(jnp.int32)
        return (states, wptr, buf), ()

    init = (jnp.full((M,), RANS_L, jnp.uint32),
            jnp.zeros((M,), jnp.int32),
            jnp.zeros((M, T), jnp.uint32))
    (states, counts, buf), _ = jax.lax.scan(
        step, init, (freq_sel, start_sel, active), reverse=True)
    return buf, counts, states


# ---------------------------------------------------------------------------
# Interleaved-stream variant: R persistent lanes, S = M / R sub-iterations
# per wavefront step, ONE shared word stream.
#
# M concurrent positions per step would naively need M rANS states (each
# lane can absorb at most one symbol per step), and every independent
# stream costs ~64 bits of overhead (state flush + length). Since all M
# CDFs of a step are known up-front, only the *integer state updates*
# serialize — so R lanes each absorb S symbols per step in S cheap
# sub-iterations ((R,)-wide VPU ops), cutting per-image overhead from
# M x 64 bits to R x 32 bits + one length. Renormalization words go to a
# single stream in deterministic (step, sub-iter, lane-rank) order via a
# prefix sum, which removes the per-lane length table entirely.
# ---------------------------------------------------------------------------

R_LANES = 64


def decode_step_interleaved(states, gptr, stream, freq, cdf_low, active,
                            cnt=None, thresh=None):
    """One wavefront step of interleaved decode.

    states: (R,) uint32; gptr: () int32 read pointer into stream (W,) uint32;
    freq/cdf_low: (M, L) uint32 with M = R*S; active: (M,).

    Tail packing (container v8): cnt (R,) int32 counts symbols decoded so
    far per lane and thresh (R,) int32 = total_active - k marks where each
    lane's pull test switches off (the encoder's warmup symbols, its first
    k = the decoder's LAST k, emitted nothing — see scalar_encode). Pass
    cnt=thresh=None for the classic x0=RANS_L streams.

    Returns (symbols (M,) int32, states, gptr, cnt)."""
    m = freq.shape[0]
    r = R_LANES if m >= R_LANES else m
    assert m % r == 0, (m, r)
    syms = []
    for si in range(m // r):
        sl = slice(si * r, (si + 1) * r)
        f_t, c_t, a = freq[sl], cdf_low[sl], active[sl]
        slot = (states & jnp.uint32(SCALE - 1)).astype(jnp.uint32)
        sym = (jnp.sum(c_t <= slot[:, None], axis=-1) - 1).astype(jnp.int32)
        f = jnp.take_along_axis(f_t, sym[:, None], axis=-1)[:, 0]
        start = jnp.take_along_axis(c_t, sym[:, None], axis=-1)[:, 0]
        x = f * (states >> SCALE_BITS) + slot - start
        need = a & (x < jnp.uint32(RANS_L))
        if cnt is not None:
            need = need & (cnt < thresh)
            cnt = cnt + a.astype(jnp.int32)
        rank = jnp.cumsum(need.astype(jnp.int32)) - need.astype(jnp.int32)
        w = jnp.take(stream, jnp.clip(gptr + rank, 0, stream.shape[0] - 1))
        x = jnp.where(need, (x << WORD_BITS) | w, x)
        states = jnp.where(a, x, states)
        gptr = gptr + jnp.sum(need.astype(jnp.int32))
        syms.append(jnp.where(a, sym, 0))
    return jnp.concatenate(syms), states, gptr, cnt


def encode_reverse_scan_interleaved(freq_sel: jax.Array, start_sel: jax.Array,
                                    active: jax.Array, x0: int = RANS_L):
    """On-device reverse interleaved encode matching decode_step_interleaved.

    freq_sel/start_sel: (T, M) uint32, active: (T, M). Returns
    (words (W,) uint32 in REVERSED (emission) order, n_words (), states (R,),
    k (R,) int32 warmup counts — all zero for the classic x0=RANS_L seed;
    see scalar_encode for the x0=1 tail-packing scheme).
    The decode-order stream is words[:n_words][::-1]."""
    T, m = freq_sel.shape
    r = R_LANES if m >= R_LANES else m
    s_count = m // r
    w_cap = T * m  # static upper bound: <= 1 word per symbol slot

    def step(carry, x):
        states, gw, buf, kwarm = carry
        f_all, st_all, a_all = x
        # Reverse sub-iteration order; within one, emit in descending
        # lane-rank so the final global reversal restores decode order.
        for si in range(s_count - 1, -1, -1):
            sl = slice(si * r, (si + 1) * r)
            f = jnp.maximum(f_all[sl], jnp.uint32(1))
            st = st_all[sl]
            a = a_all[sl]
            kwarm = kwarm + (a & (states < jnp.uint32(RANS_L))
                             ).astype(jnp.int32)
            emit = a & (states >= (f << WORD_BITS))
            word = states & jnp.uint32(WORD_MASK)
            e32 = emit.astype(jnp.int32)
            fwd_rank = jnp.cumsum(e32) - e32
            total = jnp.sum(e32)
            pos = jnp.where(emit, gw + (total - 1 - fwd_rank), w_cap)
            buf = buf.at[pos].set(word, mode='drop')
            states = jnp.where(emit, states >> WORD_BITS, states)
            x_new = ((states // f) << SCALE_BITS) + (states % f) + st
            states = jnp.where(a, x_new, states)
            gw = gw + total
        return (states, gw, buf, kwarm), ()

    init = (jnp.full((r,), x0, jnp.uint32), jnp.zeros((), jnp.int32),
            jnp.zeros((w_cap,), jnp.uint32), jnp.zeros((r,), jnp.int32))
    (states, n_words, buf, k), _ = jax.lax.scan(
        step, init, (freq_sel, start_sel, active), reverse=True)
    return buf, n_words, states, k


# ---------------------------------------------------------------------------
# In-scan decode step (jnp) — used inside the wavefront scan
# ---------------------------------------------------------------------------

def decode_step(states: jax.Array, ptrs: jax.Array, streams: jax.Array,
                freq: jax.Array, cdf_low: jax.Array, active: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One vectorized rANS decode step for M lanes.

    states: (M,) uint32; ptrs: (M,) int32 read pointers; streams: (M, W)
    uint32 word buffers; freq/cdf_low: (M, L) uint32 this step's tables;
    active: (M,) bool. Returns (symbols (M,) int32, new_states, new_ptrs);
    inactive lanes keep their state/ptr and return symbol 0.
    """
    m = states.shape[0]
    slot = (states & jnp.uint32(SCALE - 1)).astype(jnp.uint32)
    sym = (jnp.sum((cdf_low <= slot[:, None]), axis=-1) - 1).astype(jnp.int32)
    f = jnp.take_along_axis(freq, sym[:, None].astype(jnp.int32), axis=-1)[:, 0]
    start = jnp.take_along_axis(cdf_low, sym[:, None].astype(jnp.int32), axis=-1)[:, 0]
    x = f * (states >> SCALE_BITS) + slot - start
    need = x < jnp.uint32(RANS_L)
    word = jnp.take_along_axis(streams, jnp.clip(ptrs, 0, streams.shape[1] - 1)[:, None],
                               axis=-1)[:, 0]
    x = jnp.where(need, (x << WORD_BITS) | word, x)
    new_ptrs = ptrs + need.astype(jnp.int32)
    states_out = jnp.where(active, x, states)
    ptrs_out = jnp.where(active, new_ptrs, ptrs)
    sym_out = jnp.where(active, sym, 0)
    return sym_out, states_out, ptrs_out
