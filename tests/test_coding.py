import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.coding import codec as codec_lib
from imgcomp_cvpr_tpu.coding import rans, wavefront
from imgcomp_cvpr_tpu.models import probclass
from imgcomp_cvpr_tpu.utils import config as config_lib


# ---------------- rANS primitives ----------------

def _random_tables(rng, n, L=6):
    probs = rng.dirichlet(np.ones(L) * 0.5, size=n).astype(np.float32)
    freq, cdf_low = jax.device_get(rans.quantize_cdf(jnp.asarray(probs)))
    return probs, freq.astype(np.uint32), cdf_low.astype(np.uint32)


def test_quantize_cdf_invariants():
    rng = np.random.RandomState(0)
    _, freq, cdf_low = _random_tables(rng, 100)
    assert (freq >= 1).all()
    np.testing.assert_array_equal(freq.sum(axis=-1), rans.SCALE)
    np.testing.assert_array_equal(cdf_low[:, 0], 0)
    np.testing.assert_array_equal(np.cumsum(freq, axis=-1)[:, :-1], cdf_low[:, 1:])


def test_scalar_rans_roundtrip():
    rng = np.random.RandomState(1)
    n = 500
    _, freq, cdf_low = _random_tables(rng, n)
    syms = np.array([rng.choice(6, p=f / f.sum()) for f in freq])
    words, state, _ = rans.scalar_encode(syms, freq, cdf_low)
    dec = rans.scalar_decode(words, state, freq, cdf_low)
    np.testing.assert_array_equal(syms, dec)
    # coded size ~ entropy
    bits = len(words) * 16 + 32
    theo = np.sum(-np.log2(freq[np.arange(n), syms] / rans.SCALE))
    assert bits < theo + 64


def test_vectorized_encode_matches_scalar():
    rng = np.random.RandomState(2)
    T, M = 40, 5
    freq = np.zeros((T, M), np.uint32)
    start = np.zeros((T, M), np.uint32)
    active = rng.rand(T, M) < 0.8
    tables = {}
    syms = np.zeros((T, M), np.int32)
    for j in range(M):
        n = active[:, j].sum()
        _, f, c = _random_tables(rng, n)
        s = np.array([rng.choice(6, p=ff / ff.sum()) for ff in f])
        tables[j] = (f, c, s)
        freq[active[:, j], j] = f[np.arange(n), s]
        start[active[:, j], j] = c[np.arange(n), s]
        syms[active[:, j], j] = s
    streams, states, _ = rans.vectorized_encode(freq, start, active)
    for j in range(M):
        f, c, s = tables[j]
        words_ref, state_ref, _ = rans.scalar_encode(s, f, c)
        np.testing.assert_array_equal(streams[j], words_ref)
        assert int(states[j]) == state_ref
        dec = rans.scalar_decode(list(streams[j]), int(states[j]), f, c)
        np.testing.assert_array_equal(dec, s)


def test_decode_step_matches_scalar():
    rng = np.random.RandomState(3)
    n = 64
    _, freq, cdf_low = _random_tables(rng, n)
    syms = np.array([rng.choice(6, p=f / f.sum()) for f in freq])
    words, state, _ = rans.scalar_encode(syms, freq, cdf_low)
    streams = np.zeros((1, n), np.uint32)
    streams[0, :len(words)] = words
    states = jnp.asarray([state], jnp.uint32)
    ptrs = jnp.zeros((1,), jnp.int32)
    streams_j = jnp.asarray(streams)
    out = []
    for i in range(n):
        sym, states, ptrs = rans.decode_step(
            states, ptrs, streams_j,
            jnp.asarray(freq[i:i + 1]), jnp.asarray(cdf_low[i:i + 1]),
            jnp.asarray([True]))
        out.append(int(sym[0]))
    np.testing.assert_array_equal(out, syms)


# ---------------- wavefront schedule ----------------

def test_schedule_covers_all_positions():
    sched = wavefront.build_schedule((4, 6, 8), 9)
    assert sched.active.sum() == 4 * 6 * 8
    seen = set()
    for t in range(sched.T):
        for j in range(sched.M):
            if sched.active[t, j]:
                seen.add(tuple(sched.positions[t, j]))
    assert len(seen) == 4 * 6 * 8


def test_schedule_causality():
    sched = wavefront.build_schedule((3, 5, 6), 9)
    wavefront.check_schedule_causality(sched, 9)


def test_wavefront_coeffs():
    a, b, c = wavefront.wavefront_coeffs(4)
    assert (a, b, c) == (25, 5, 1)
    # every causal dependency within the receptive field has smaller t
    p = 4
    for dd in range(0, 5):
        for dh in range(-p, p + 1):
            for dw in range(-p, p + 1):
                if dd == 0 and (dh > 0 or (dh == 0 and dw >= 0)):
                    continue  # not causal (self or later)
                # dep at (d-dd, h+dh, w+dw)? causal deps have dd>0, any dh/dw,
                # or dd==0, dh<0, or dd==0, dh==0, dw<0
                delta_t = a * dd - b * dh - c * dw
                if dd > 0 or (dd == 0 and dh < 0) or (dd == 0 and dh == 0 and dw < 0):
                    assert delta_t > 0, (dd, dh, dw)


# ---------------- full codec ----------------

@pytest.fixture(scope='module')
def tiny_pc_setup():
    cfg, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    cfg = cfg.replace(arch_param__k=4)
    pc = probclass.ProbClassifier(cfg, num_centers=6)
    latent = (3, 6, 7)  # (C, H, W)
    params = pc.init(jax.random.PRNGKey(0), (1, latent[1], latent[2], latent[0]))
    centers = np.linspace(-2, 2, 6).astype(np.float32)
    return cfg, pc, params, centers, latent


def test_codec_roundtrip_bit_exact(tiny_pc_setup):
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg)
    rng = np.random.RandomState(0)
    symbols = rng.randint(0, 6, size=latent)
    result = codec.roundtrip(params, symbols, centers)  # asserts exactness
    assert result.num_bits > 0
    # coded size within header + lane overhead of theoretical
    sched = wavefront.build_schedule(latent, 9)
    overhead_bits = 8 * (4 + 2 + 6 + 4) + sched.M * (32 + 32 + 16)
    assert result.num_bits <= result.theoretical_bits + overhead_bits


def test_codec_theoretical_bits_match_bitcost(tiny_pc_setup):
    """Quantized-CDF cost must track the model cross-entropy (the reference's
    entropy-consistency triangle, ref bit_counter.py:51-57, val.py:174)."""
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg)
    rng = np.random.RandomState(1)
    symbols = rng.randint(0, 6, size=latent)
    result = codec.encode(params, symbols, centers)

    # full-parallel-pass bitcost (training/val rate): NHWC
    syms_nhwc = jnp.asarray(np.transpose(symbols, (1, 2, 0))[None])
    q_nhwc = jnp.asarray(centers)[syms_nhwc]
    bc = pc.bitcost(params, q_nhwc, syms_nhwc, pad_value=centers[0])
    bitcost_total = float(jnp.sum(bc))
    # CDF quantization with SCALE=2^16 and L=6 costs < 0.1% typically
    assert result.theoretical_bits == pytest.approx(bitcost_total, rel=5e-3)


def test_container_state_packing_edges():
    """Container v7 entropy-packs the rANS decode-entry states (4-bit
    length + MSB-implicit hi value). Exercise the hi extremes (1 and
    2^16 - 1), full-range randoms, and the serialize/deserialize
    round-trip incl. derived word count."""
    rng = np.random.RandomState(3)
    cases = [
        np.full(32, rans.RANS_L, np.uint32),                  # hi = 1
        np.full(32, 0xFFFFFFFF, np.uint32),                   # hi = 2^16-1
        ((rng.randint(1, 1 << 16, size=32).astype(np.uint64) << np.uint64(16))
         | rng.randint(0, 1 << 16, size=32).astype(np.uint64)
         ).astype(np.uint32),
        np.asarray([rans.RANS_L], np.uint32),                 # R = 1
    ]
    for states in cases:
        r = len(states)
        packed = codec_lib._pack_states(states)
        got, consumed = codec_lib._unpack_states_v11(
            r, b'\x00' * 5 + packed + b'\xAB', 5)
        assert consumed == len(packed)
        np.testing.assert_array_equal(got, states)
        # The container must never lose vs raw u32 states: worst-case
        # entropy packing (every hi at 16 bits) escapes to raw via the
        # nstates high bit.
        blob_min = codec_lib.serialize_stream(
            (4, 6, 8), np.zeros(0, np.uint32), states)
        assert len(blob_min) <= 15 + 4 * r
        words = rng.randint(0, 1 << 16, size=37).astype(np.uint32)
        blob = codec_lib.serialize_stream((4, 6, 8), words, states,
                                          sym_crc=0xDEADBEEF, impl_id=2,
                                          prec=1)
        shape, w2, st2, crc, k2 = codec_lib.deserialize_stream(blob)
        assert k2 is None
        assert shape == (4, 6, 8) and crc == 0xDEADBEEF
        assert codec_lib.stream_impl_id(blob) == 2
        assert codec_lib.stream_prec(blob) == 1
        np.testing.assert_array_equal(w2, words)
        np.testing.assert_array_equal(st2, states)


def test_tail_packing_roundtrip_and_size(tiny_pc_setup, monkeypatch):
    """Container v8 tail packing (x0=1): bit-exact roundtrip, k-table in
    the container, mixed tail/legacy decode batches, and the lane-length
    auto-gate (tiny latents whose 1-2-symbol lanes cannot amortize the
    k-table stay on the classic seed). On real content the measured win
    is ~650 bits/image before the ~390-bit k-table (PERF.md)."""
    cfg, pc, params, centers, latent = tiny_pc_setup
    rng = np.random.RandomState(5)
    # near-deterministic volume: long runs of one symbol
    symbols = np.full(latent, 2, np.int64)
    symbols.reshape(-1)[rng.rand(symbols.size) < 0.15] = 4
    codec = codec_lib.LatentCodec(pc, cfg)
    # the tiny fixture's lanes are far below the auto-gate: legacy mode
    res_auto = codec.encode(params, symbols, centers)
    assert codec_lib.deserialize_stream(res_auto.bitstream)[4] is None
    monkeypatch.setattr(codec_lib, 'TAIL_MIN_LANE_SYMBOLS', 0)
    res_tail = codec.encode(params, symbols, centers)
    shape, words, states, crc, k = codec_lib.deserialize_stream(
        res_tail.bitstream)
    assert k is not None and (k >= 0).all() and k.max() <= codec_lib.K_CAP
    assert k.max() > 0        # deterministic runs produce real warmups
    dec = codec.decode(params, res_tail.bitstream, centers)
    np.testing.assert_array_equal(dec, symbols)
    # tail mode saves the 16-bit/lane seed flush; the k-table costs
    # kw*r+8 — net within the k-table size of legacy even here
    monkeypatch.setenv('IMGCOMP_RANS_X0', 'L')
    codec_l = codec_lib.LatentCodec(pc, cfg)
    res_leg = codec_l.encode(params, symbols, centers)
    assert codec_lib.deserialize_stream(res_leg.bitstream)[4] is None
    assert res_tail.num_bits <= res_leg.num_bits + 8 * (
        len(k) * 2 // 8 + 2)
    # legacy streams decode through the same executable (thresh never binds)
    dec_leg = codec.decode(params, res_leg.bitstream, centers)
    np.testing.assert_array_equal(dec_leg, symbols)
    # ... and a mixed batch of tail + legacy streams decodes in one call
    mixed = codec.decode_batch(
        params, [res_tail.bitstream, res_leg.bitstream], centers)
    np.testing.assert_array_equal(mixed[0], symbols)
    np.testing.assert_array_equal(mixed[1], symbols)


def test_container_k_table_roundtrip():
    """k-table packing: kw sizing, 16-bit extremes, tail-mode wide state
    packing (hi = 0 states legal), impl byte bit 7 masking."""
    rng = np.random.RandomState(9)
    for r, kmax in [(32, 0), (32, 1), (32, 2678), (32, 65535), (7, 13)]:
        k = rng.randint(0, kmax + 1, size=r).astype(np.int32)
        k[0] = kmax
        # tail-mode states may sit below RANS_L (hi = 0)
        states = rng.randint(1, 1 << 32, size=r).astype(np.uint32)
        states[0] = 5
        words = rng.randint(0, 1 << 16, size=11).astype(np.uint32)
        blob = codec_lib.serialize_stream((4, 6, 8), words, states,
                                          sym_crc=77, impl_id=2, k=k)
        assert codec_lib.stream_impl_id(blob) == 2          # bit 7 masked
        shape, w2, st2, crc, k2 = codec_lib.deserialize_stream(blob)
        np.testing.assert_array_equal(w2, words)
        np.testing.assert_array_equal(st2, states)
        np.testing.assert_array_equal(k2, k)


def test_codec_rejects_corrupt_stream(tiny_pc_setup):
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg)
    rng = np.random.RandomState(2)
    symbols = rng.randint(0, 6, size=latent)
    result = codec.encode(params, symbols, centers)
    corrupted = bytearray(result.bitstream)
    corrupted[-3] ^= 0xFF  # flip bits in some lane words
    with pytest.raises(ValueError, match='CRC'):
        codec.decode(params, bytes(corrupted), centers)
    decoded = codec.decode(params, bytes(corrupted), centers, verify=False)
    assert not np.array_equal(decoded, symbols)


# ---------------- container back-compat (v8) ----------------

def _serialize_v8(latent_shape, stream_words, final_states, sym_crc=0,
                  impl_id=2, prec=0, k=None):
    """Frozen copy of the container-v8 WRITER (the byte-oriented header
    retired by v9's bit packing) so the v8 decode path stays covered
    without archived binaries. Kept verbatim from the v8-era codec.py —
    do not 'fix' it to track the live format."""
    import io as _io

    def pack_states_v8(states, wide):
        st = np.asarray(states, np.uint64)
        lo = (st & np.uint64(0xFFFF)).astype(np.uint16)
        hi = (st >> np.uint64(16)).astype(np.uint32)
        acc = 0
        nbits = 0
        for h in hi:
            h = int(h)
            if wide:                       # flat 5-bit bit_length in [0,16]
                ln = h.bit_length()
                acc |= ln << nbits
                nbits += 5
                if ln:
                    acc |= (h - (1 << (ln - 1))) << nbits
                    nbits += ln - 1
            else:
                ln = h.bit_length() - 1
                acc |= ln << nbits
                nbits += 4
                acc |= (h - (1 << ln)) << nbits
                nbits += ln
        return lo.tobytes() + acc.to_bytes((nbits + 7) // 8, 'little')

    r = len(final_states)
    packed = pack_states_v8(final_states, wide=k is not None)
    if len(packed) > 4 * r:
        r |= 0x80
        packed = np.asarray(final_states, np.uint32).tobytes()
    buf = _io.BytesIO()
    buf.write(codec_lib.MAGIC)
    buf.write(np.asarray([8], np.uint8).tobytes())           # VERSION = 8
    buf.write(np.asarray([impl_id | (0x80 if k is not None else 0)],
                         np.uint8).tobytes())
    buf.write(np.asarray([prec], np.uint8).tobytes())
    buf.write(np.asarray(latent_shape, np.uint16).tobytes())
    buf.write(np.asarray([sym_crc], np.uint32).tobytes())
    buf.write(np.asarray([r], np.uint8).tobytes())
    buf.write(packed)
    if k is not None:
        k = np.asarray(k, np.int64)
        kw = max(1, int(k.max()).bit_length())
        acc = 0
        for i, kv in enumerate(k):
            acc |= int(kv) << (i * kw)
        buf.write(np.asarray([kw], np.uint8).tobytes())
        buf.write(acc.to_bytes((len(k) * kw + 7) // 8, 'little'))
    buf.write(np.asarray(stream_words, np.uint16).tobytes())
    return buf.getvalue()


# One v8 container captured as literal bytes (generated by the frozen
# writer above; pinned so decoder drift OR writer-copy drift both fail):
# shape (4,6,8), impl 2, prec 1, crc 0xDEADBEEF, states [2^16, 5, 70000],
# k [3, 0, 12], words [1, 65535, 258].
_V8_PINNED_HEX = ('a7088201040006000800efbeadde0300000500701101'
                  '0404030c0100ffff0201')
_V8_PINNED = bytes.fromhex(_V8_PINNED_HEX)


def test_container_v8_parse_pinned_bytes():
    """v8-era archives must keep parsing byte-for-byte (VERSION is now 9;
    deserialize_stream dispatches on the header version nibble)."""
    shape, words, states, crc, k = codec_lib.deserialize_stream(_V8_PINNED)
    assert shape == (4, 6, 8)
    assert crc == 0xDEADBEEF
    np.testing.assert_array_equal(states,
                                  np.asarray([1 << 16, 5, 70000], np.uint32))
    np.testing.assert_array_equal(k, np.asarray([3, 0, 12], np.int32))
    np.testing.assert_array_equal(words,
                                  np.asarray([1, 65535, 258], np.uint32))
    assert codec_lib.stream_impl_id(_V8_PINNED) == 2
    assert codec_lib.stream_prec(_V8_PINNED) == 1
    # the frozen writer reproduces the pinned bytes exactly
    regen = _serialize_v8((4, 6, 8), words, states, sym_crc=0xDEADBEEF,
                          impl_id=2, prec=1, k=k)
    assert regen == _V8_PINNED


def test_container_v8_streams_decode(tiny_pc_setup, monkeypatch):
    """End-to-end v8 back-compat: streams the v8-era encoder would have
    produced (same payload words/states/k, v8 side-info packing) must
    decode bit-exactly through the current codec, in legacy AND
    tail-packed modes, including mixed v8+v9 batches."""
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg)
    rng = np.random.RandomState(11)
    symbols = rng.randint(0, 6, size=latent)
    impl_id = codec_lib.IMPL_IDS[codec.impl]

    res_leg = codec.encode(params, symbols, centers)         # auto: legacy
    shape, words, states, crc, k = codec_lib.deserialize_stream(
        res_leg.bitstream)
    assert k is None
    v8_leg = _serialize_v8(shape, words, states, sym_crc=crc,
                           impl_id=impl_id)
    np.testing.assert_array_equal(
        codec.decode(params, v8_leg, centers), symbols)

    monkeypatch.setattr(codec_lib, 'TAIL_MIN_LANE_SYMBOLS', 0)
    res_tail = codec.encode(params, symbols, centers)
    shape, words, states, crc, k = codec_lib.deserialize_stream(
        res_tail.bitstream)
    assert k is not None
    v8_tail = _serialize_v8(shape, words, states, sym_crc=crc,
                            impl_id=impl_id, k=k)
    np.testing.assert_array_equal(
        codec.decode(params, v8_tail, centers), symbols)
    # a mixed v8 + v9 batch decodes in one call
    mixed = codec.decode_batch(
        params, [v8_tail, res_leg.bitstream, res_tail.bitstream], centers)
    for got in mixed:
        np.testing.assert_array_equal(got, symbols)


def _serialize_v9(latent_shape, stream_words, final_states, sym_crc=0,
                  impl_id=2, prec=0, k=None):
    """Frozen copy of the container-v9 WRITER (bit-packed 12/14-byte
    header — no narrow-shape mode — and the flat kmin + span-width-delta
    k-table that v10 replaced with the scheme-bit flat/Rice code). Kept
    verbatim so v9-era archives stay covered."""
    import io as _io

    def pack_states_v9(final_states, wide=False):
        st = np.asarray(final_states, np.uint64)
        lo = (st & np.uint64(0xFFFF)).astype(np.uint16)
        hi = (st >> np.uint64(16)).astype(np.uint32)
        acc, nbits = 0, 0
        for h in hi:
            h = int(h)
            if wide:
                ln = h.bit_length()
                if ln < 15:
                    acc |= ln << nbits
                    nbits += 4
                else:
                    acc |= 15 << nbits
                    acc |= (ln - 15) << (nbits + 4)
                    nbits += 5
                if ln:
                    acc |= (h - (1 << (ln - 1))) << nbits
                    nbits += ln - 1
            else:
                ln = h.bit_length() - 1
                acc |= ln << nbits
                nbits += 4
                acc |= (h - (1 << ln)) << nbits
                nbits += ln
        return lo.tobytes() + acc.to_bytes((nbits + 7) // 8, 'little')

    r = len(final_states)
    packed = pack_states_v9(final_states, wide=k is not None)
    rawesc = len(packed) > 4 * r
    if rawesc:
        packed = np.asarray(final_states, np.uint32).tobytes()
    shape = tuple(int(v) for v in latent_shape)
    shapewide = any(v >= (1 << 12) for v in shape)
    hdr = int.from_bytes(codec_lib.MAGIC, 'little')
    hdr |= 9 << 8
    hdr |= (impl_id & 0x7) << 12
    hdr |= (1 if k is not None else 0) << 15
    hdr |= (prec & 0x3) << 16
    hdr |= (1 if rawesc else 0) << 18
    hdr |= (1 if shapewide else 0) << 19
    hdr |= r << 20
    pos = 28
    sw = 16 if shapewide else 12
    for v in shape:
        hdr |= v << pos
        pos += sw
    hdr |= (sym_crc & 0xFFFFFFFF) << pos
    pos += 32
    buf = _io.BytesIO()
    buf.write(hdr.to_bytes((pos + 7) // 8, 'little'))
    buf.write(packed)
    if k is not None:
        k = np.asarray(k, np.int64)
        kmin = int(k.min())
        kw = max(1, int(k.max() - kmin).bit_length())
        acc = kw - 1
        nb = 4
        for kv in k:
            acc |= (int(kv) - kmin) << nb
            nb += kw
        buf.write(np.asarray([kmin], np.uint16).tobytes())
        buf.write(acc.to_bytes((nb + 7) // 8, 'little'))
    buf.write(np.asarray(stream_words, np.uint16).tobytes())
    return buf.getvalue()


# One v9 container captured as literal bytes (generated by the frozen
# writer above): shape (4,6,8), impl 3, prec 1, crc 0xDEADBEEF,
# states [2^16, 5, 70000], k [3, 0, 12], words [1, 65535, 258].
_V9_PINNED_HEX = ('a7b9314000068000efbeadde00000500701101'
                  '01000033c00100ffff0201')
_V9_PINNED = bytes.fromhex(_V9_PINNED_HEX)


def test_container_v9_parse_pinned_bytes():
    """v9-era archives must keep parsing byte-for-byte (VERSION is now
    10; deserialize_stream shares one parser and branches on the version
    nibble only at the k-table block)."""
    shape, words, states, crc, k = codec_lib.deserialize_stream(_V9_PINNED)
    assert shape == (4, 6, 8)
    assert crc == 0xDEADBEEF
    np.testing.assert_array_equal(states,
                                  np.asarray([1 << 16, 5, 70000], np.uint32))
    np.testing.assert_array_equal(k, np.asarray([3, 0, 12], np.int32))
    np.testing.assert_array_equal(words,
                                  np.asarray([1, 65535, 258], np.uint32))
    assert codec_lib.stream_impl_id(_V9_PINNED) == 3
    assert codec_lib.stream_prec(_V9_PINNED) == 1
    regen = _serialize_v9((4, 6, 8), words, states, sym_crc=0xDEADBEEF,
                          impl_id=3, prec=1, k=k)
    assert regen == _V9_PINNED


def test_container_v9_streams_decode(tiny_pc_setup, monkeypatch):
    """End-to-end v9 back-compat: streams the v9-era encoder would have
    produced must decode bit-exactly through the current codec, legacy
    AND tail-packed, including mixed v9+v10 batches."""
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg)
    rng = np.random.RandomState(17)
    symbols = rng.randint(0, 6, size=latent)
    impl_id = codec_lib.IMPL_IDS[codec.impl]

    res_leg = codec.encode(params, symbols, centers)
    shape, words, states, crc, k = codec_lib.deserialize_stream(
        res_leg.bitstream)
    assert k is None
    v9_leg = _serialize_v9(shape, words, states, sym_crc=crc,
                           impl_id=impl_id)
    np.testing.assert_array_equal(
        codec.decode(params, v9_leg, centers), symbols)

    monkeypatch.setattr(codec_lib, 'TAIL_MIN_LANE_SYMBOLS', 0)
    res_tail = codec.encode(params, symbols, centers)
    shape, words, states, crc, k = codec_lib.deserialize_stream(
        res_tail.bitstream)
    assert k is not None
    v9_tail = _serialize_v9(shape, words, states, sym_crc=crc,
                            impl_id=impl_id, k=k)
    np.testing.assert_array_equal(
        codec.decode(params, v9_tail, centers), symbols)
    mixed = codec.decode_batch(
        params, [v9_tail, res_leg.bitstream, res_tail.bitstream], centers)
    for got in mixed:
        np.testing.assert_array_equal(got, symbols)


def test_container_v10_ktable_and_narrow_shape():
    """v10 k-table (varint anchor + scheme-bit flat/Rice) round-trips
    over adversarial k distributions and never exceeds the v9 flat size
    by more than the 4-bit anchor-varint overhead; narrow shapes (<256
    per dim) get the 11-byte header."""
    rng = np.random.RandomState(3)
    for trial in range(60):
        r = int(rng.choice([1, 16, 32, 64]))
        style = trial % 7
        if style == 6:
            # lane-correlated random walk: the v11 Rice-delta scheme's
            # winning case (adjacent-lane deltas much tighter than the
            # median residuals)
            k = np.clip(800 + np.cumsum(rng.randint(-40, 41, size=r)),
                        0, codec_lib.K_CAP).astype(np.int64)
        elif style == 0:
            k = rng.randint(0, 3, size=r)
        elif style == 1:
            k = np.clip(rng.normal(800, 120, size=r), 0,
                        codec_lib.K_CAP).astype(np.int64)
        elif style == 2:
            k = rng.randint(0, codec_lib.K_CAP + 1, size=r)
        elif style == 3:
            k = np.full(r, rng.randint(0, codec_lib.K_CAP + 1))
        elif style == 4:
            k = np.zeros(r, np.int64)
        else:
            k = np.clip(rng.normal(600, 100, size=r), 0,
                        codec_lib.K_CAP).astype(np.int64)
            k[rng.randint(r)] = rng.randint(0, codec_lib.K_CAP + 1)
        k = np.asarray(k)
        blob = codec_lib._pack_ktable(k)
        k2, consumed = codec_lib._unpack_ktable(r, blob, 0)
        assert consumed == len(blob)
        np.testing.assert_array_equal(k2, k)
        kw = max(1, int(k.max() - k.min()).bit_length())
        v9_bits = 16 + 4 + r * kw
        # worst case: a 16-bit anchor's varint costs 5+15 = 20 bits vs
        # v9's fixed 16, plus the scheme bit, plus byte padding
        assert len(blob) * 8 <= v9_bits + 5 + 7
        states = rng.randint(1, 1 << 32, size=r).astype(np.uint32)
        words = rng.randint(0, 1 << 16, size=9).astype(np.uint32)
        for shape, hdr_len in [((4, 6, 8), 11), ((32, 300, 96), 12),
                               ((32, 5000, 8), 14)]:
            b = codec_lib.serialize_stream(shape, words, states,
                                           sym_crc=77, impl_id=3, k=k)
            sh, w2, st2, crc, k3 = codec_lib.deserialize_stream(b)
            assert (sh, crc) == (shape, 77)
            np.testing.assert_array_equal(k3, k)
            np.testing.assert_array_equal(w2, words)
            np.testing.assert_array_equal(st2, states)
            # header length: the states block starts right after it
            rawesc = bool((int.from_bytes(b[:4], 'little') >> 18) & 1)
            if rawesc:
                raw = np.frombuffer(b[hdr_len:hdr_len + 4 * r], np.uint32)
                np.testing.assert_array_equal(raw, states)
            else:
                lo = np.frombuffer(b[hdr_len:hdr_len + 2 * r], np.uint16)
                np.testing.assert_array_equal(
                    lo, (states & 0xFFFF).astype(np.uint16))


def _serialize_v10(latent_shape, stream_words, final_states, sym_crc=0,
                   impl_id=2, prec=0, k=None):
    """Frozen copy of the container-v10 WRITER: v11's header with the
    v9/v10 per-lane interleaved state descriptors (4-bit length +
    MSB-implicit hi mantissa per lane; wide d=15 borrows a 16th-length
    selector bit) that v11 replaced with a scheme-selected descriptor
    TABLE, and the v10 k-table (1-bit flat/Rice-median scheme field —
    v11 widened Rice to a 2-bit field to add the lane-delta scheme).
    Kept verbatim so v10-era archives stay covered."""
    import io as _io

    def pack_ktable_v10(k):
        k = np.asarray(k, np.int64)
        r = len(k)
        kmin = int(k.min())
        kw = max(1, int(k.max() - kmin).bit_length())
        flat_bits = 5 + r * kw
        kmed = int(np.median(k))
        res = k - kmed
        z = np.where(res >= 0, 2 * res, -2 * res - 1).astype(np.int64)
        rice_m, rice_bits = 0, None
        for m in range(16):
            c = int(np.sum(z >> m)) + r * (1 + m)
            if rice_bits is None or c < rice_bits:
                rice_m, rice_bits = m, c
        rice_bits += 5
        use_rice = rice_bits < flat_bits
        anchor = kmed if use_rice else kmin
        ln = anchor.bit_length()
        acc, nb = ln, 5
        if ln:
            acc |= (anchor - (1 << (ln - 1))) << nb
            nb += ln - 1
        if use_rice:
            acc |= (1 | (rice_m << 1)) << nb
            nb += 5
            for zv in z:
                q = int(zv) >> rice_m
                acc |= ((1 << q) - 1) << nb
                nb += q + 1
                acc |= (int(zv) & ((1 << rice_m) - 1)) << nb
                nb += rice_m
        else:
            acc |= ((kw - 1) << 1) << nb
            nb += 5
            for kv in k:
                acc |= (int(kv) - kmin) << nb
                nb += kw
        return acc.to_bytes((nb + 7) // 8, 'little')

    def pack_states_v10(final_states, wide=False):
        st = np.asarray(final_states, np.uint64)
        lo = (st & np.uint64(0xFFFF)).astype(np.uint16)
        hi = (st >> np.uint64(16)).astype(np.uint32)
        acc, nbits = 0, 0
        for h in hi:
            h = int(h)
            if wide:
                ln = h.bit_length()
                if ln < 15:
                    acc |= ln << nbits
                    nbits += 4
                else:
                    acc |= 15 << nbits
                    acc |= (ln - 15) << (nbits + 4)
                    nbits += 5
                if ln:
                    acc |= (h - (1 << (ln - 1))) << nbits
                    nbits += ln - 1
            else:
                ln = h.bit_length() - 1
                acc |= ln << nbits
                nbits += 4
                acc |= (h - (1 << ln)) << nbits
                nbits += ln
        return lo.tobytes() + acc.to_bytes((nbits + 7) // 8, 'little')

    r = len(final_states)
    packed = pack_states_v10(final_states, wide=k is not None)
    rawesc = len(packed) > 4 * r
    if rawesc:
        packed = np.asarray(final_states, np.uint32).tobytes()
    shape = tuple(int(v) for v in latent_shape)
    shapewide = any(v >= (1 << 12) for v in shape)
    shapenarrow = all(v < (1 << 8) for v in shape)
    hdr = int.from_bytes(codec_lib.MAGIC, 'little')
    hdr |= 10 << 8
    hdr |= (impl_id & 0x7) << 12
    hdr |= (1 if k is not None else 0) << 15
    hdr |= (prec & 0x3) << 16
    hdr |= (1 if rawesc else 0) << 18
    hdr |= (1 if shapewide else 0) << 19
    hdr |= r << 20
    hdr |= (1 if shapenarrow else 0) << 27
    pos = 28
    sw = 16 if shapewide else (8 if shapenarrow else 12)
    for v in shape:
        hdr |= v << pos
        pos += sw
    hdr |= (sym_crc & 0xFFFFFFFF) << pos
    pos += 32
    buf = _io.BytesIO()
    buf.write(hdr.to_bytes((pos + 7) // 8, 'little'))
    buf.write(packed)
    if k is not None:
        buf.write(pack_ktable_v10(k))
    buf.write(np.asarray(stream_words, np.uint16).tobytes())
    return buf.getvalue()


# One v10 container captured as literal bytes (generated by the frozen
# writer above): shape (4,6,8) (narrow, 11-byte header), impl 3, prec 1,
# crc 0xDEADBEEF, states [2^16, 5, 70000], k [3, 0, 12],
# words [1, 65535, 258].
_V10_PINNED_HEX = 'a7ba31486080f0eedbea0d0000050070110101c00c300100ffff0201'
_V10_PINNED = bytes.fromhex(_V10_PINNED_HEX)


def test_container_v10_parse_pinned_bytes():
    """v10-era archives must keep parsing byte-for-byte (VERSION is now
    11; deserialize_stream branches on the version nibble at the states
    block — v11 moved the hi descriptors into a scheme-selected table)."""
    shape, words, states, crc, k = codec_lib.deserialize_stream(_V10_PINNED)
    assert shape == (4, 6, 8)
    assert crc == 0xDEADBEEF
    np.testing.assert_array_equal(states,
                                  np.asarray([1 << 16, 5, 70000], np.uint32))
    np.testing.assert_array_equal(k, np.asarray([3, 0, 12], np.int32))
    np.testing.assert_array_equal(words,
                                  np.asarray([1, 65535, 258], np.uint32))
    assert codec_lib.stream_impl_id(_V10_PINNED) == 3
    assert codec_lib.stream_prec(_V10_PINNED) == 1
    regen = _serialize_v10((4, 6, 8), words, states, sym_crc=0xDEADBEEF,
                           impl_id=3, prec=1, k=k)
    assert regen == _V10_PINNED


def test_container_v10_streams_decode(tiny_pc_setup, monkeypatch):
    """End-to-end v10 back-compat: streams the v10-era encoder would
    have produced must decode bit-exactly through the current codec,
    legacy AND tail-packed, including mixed v10+v11 batches."""
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg)
    rng = np.random.RandomState(23)
    symbols = rng.randint(0, 6, size=latent)
    impl_id = codec_lib.IMPL_IDS[codec.impl]

    res_leg = codec.encode(params, symbols, centers)
    shape, words, states, crc, k = codec_lib.deserialize_stream(
        res_leg.bitstream)
    assert k is None
    v10_leg = _serialize_v10(shape, words, states, sym_crc=crc,
                             impl_id=impl_id)
    np.testing.assert_array_equal(
        codec.decode(params, v10_leg, centers), symbols)

    monkeypatch.setattr(codec_lib, 'TAIL_MIN_LANE_SYMBOLS', 0)
    res_tail = codec.encode(params, symbols, centers)
    shape, words, states, crc, k = codec_lib.deserialize_stream(
        res_tail.bitstream)
    assert k is not None
    v10_tail = _serialize_v10(shape, words, states, sym_crc=crc,
                              impl_id=impl_id, k=k)
    np.testing.assert_array_equal(
        codec.decode(params, v10_tail, centers), symbols)
    mixed = codec.decode_batch(
        params, [v10_tail, res_leg.bitstream, res_tail.bitstream], centers)
    for got in mixed:
        np.testing.assert_array_equal(got, symbols)


def test_container_v11_state_descriptor_table():
    """v11 states block: the hi bit-length descriptors ride a
    scheme-selected flat/Rice table. Roundtrip over adversarial state
    distributions in BOTH tail (wide, hi=0 legal) and classic modes, and
    never exceed the v10 per-lane descriptor cost by more than the
    selector bit; on concentrated distributions (real streams: states
    near 2^32) v11 must WIN vs v10's ~4.1-bit descriptors."""
    rng = np.random.RandomState(7)
    for trial in range(40):
        r = int(rng.choice([1, 16, 32, 64]))
        style = trial % 5
        if style == 0:                 # real-stream-like: states near 2^32
            st = rng.randint(1 << 31, 1 << 32, size=r)
        elif style == 1:               # full range (classic-legal: >= 2^16)
            st = rng.randint(1 << 16, 1 << 32, size=r)
        elif style == 2:               # wide-only: sub-2^16 lanes (hi = 0)
            st = rng.randint(1, 1 << 16, size=r)
        elif style == 3:               # mixed magnitudes
            st = np.concatenate([rng.randint(1, 1 << 18, size=(r + 1) // 2),
                                 rng.randint(1 << 30, 1 << 32,
                                             size=r // 2)])[:r]
        else:                          # all-identical
            st = np.full(r, rng.randint(1 << 16, 1 << 32))
        st = st.astype(np.uint32)
        wide_only = (st < (1 << 16)).any()
        for wide in ([True] if wide_only else [True, False]):
            packed = codec_lib._pack_states(st, wide=wide)
            got, consumed = codec_lib._unpack_states_v11(
                r, b'\x00' * 3 + packed, 3, wide=wide)
            assert consumed == len(packed)
            np.testing.assert_array_equal(got, st)
        # container roundtrip through the real writer (tail mode when any
        # lane is sub-2^16 — classic streams cannot produce those)
        k = np.arange(r) * 3 if wide_only else None   # any valid k-table
        words = rng.randint(0, 1 << 16, size=7).astype(np.uint32)
        blob = codec_lib.serialize_stream((4, 6, 8), words, st, sym_crc=9,
                                          impl_id=2, k=k)
        _, w2, st2, crc, k2 = codec_lib.deserialize_stream(blob)
        np.testing.assert_array_equal(st2, st)
        np.testing.assert_array_equal(w2, words)
        if k is not None:
            np.testing.assert_array_equal(k2, k)
        # size: never more than the v10 writer + 1 selector bit (byte
        # rounding can add one more byte)
        v10 = _serialize_v10((4, 6, 8), words, st, sym_crc=9, impl_id=2,
                             k=k)
        assert len(blob) <= len(v10) + 1
    # a clustered case must actually WIN: 64 states with hi bit-lengths
    # in {12, 13} — v10 spends 4 descriptor bits/lane, v11's Rice table
    # ~1.5 (all-ln-16 states escape to rawesc in both versions, and
    # log-uniform real states have ~uniform descriptors where scheme 0
    # keeps v11 within the selector bit of v10 — tested above)
    st = rng.randint(1 << 27, 1 << 29, size=64).astype(np.uint32)
    v11b = codec_lib.serialize_stream((4, 6, 8), np.zeros(0, np.uint32),
                                      st, k=np.zeros(64, np.int64))
    v10b = _serialize_v10((4, 6, 8), np.zeros(0, np.uint32), st,
                          k=np.zeros(64, np.int64))
    assert len(v11b) <= len(v10b) - 12  # >= ~100 bits back at R=64


# ---------------- container fuzzing ----------------

def test_container_parser_fuzz():
    """Randomized corruption/truncation over the v9 bit-packed parser
    (version/width nibbles, state descriptors, k-table, wide escapes):
    deserialize_stream must always either raise cleanly or return a
    well-formed tuple — never crash the process, never loop."""
    rng = np.random.RandomState(0)
    blobs = []
    for tail in (False, True):
        states = rng.randint(1, 1 << 32, size=32).astype(np.uint32)
        k = rng.randint(0, 3000, size=32).astype(np.int32) if tail else None
        words = rng.randint(0, 1 << 16, size=53).astype(np.uint32)
        blobs.append(codec_lib.serialize_stream(
            (4, 6, 8), words, states, sym_crc=0xC0FFEE, impl_id=3, k=k))
    allowed = (AssertionError, ValueError, IndexError, OverflowError)
    for seed in range(400):
        r = np.random.RandomState(seed)
        blob = bytearray(blobs[seed % 2])
        mode = seed % 4
        if mode == 0:                                   # byte flips
            for _ in range(r.randint(1, 5)):
                blob[r.randint(len(blob))] ^= 1 << r.randint(8)
        elif mode == 1:                                 # truncation
            blob = blob[:r.randint(len(blob))]
        elif mode == 2:                                 # flips + truncation
            blob = blob[:r.randint(1, len(blob))]
            if blob:
                blob[r.randint(len(blob))] ^= r.randint(1, 256)
        else:                                           # garbage extension
            blob = blob + bytes(r.randint(0, 256, size=r.randint(1, 9),
                                          dtype=np.uint8))
        try:
            out = codec_lib.deserialize_stream(bytes(blob))
        except allowed:
            continue
        shape, words, states, crc, k = out              # well-formed tuple
        assert len(shape) == 3
        assert states.dtype == np.uint32
        assert k is None or len(k) == len(states)


def test_codec_fuzz_payload_never_misdecodes(tiny_pc_setup, monkeypatch):
    """Payload-region corruption (states/k-table/stream words — header
    left intact so the executable shape stays fixed) through the FULL
    decode with verify=True: every case must either raise or return the
    exact original symbols (a flip in side-info dont-care bits, e.g. the
    final byte's padding, may legitimately decode clean). Never a wrong
    volume, never a hang."""
    cfg, pc, params, centers, latent = tiny_pc_setup
    monkeypatch.setattr(codec_lib, 'TAIL_MIN_LANE_SYMBOLS', 0)
    codec = codec_lib.LatentCodec(pc, cfg)
    rng = np.random.RandomState(21)
    symbols = rng.randint(0, 6, size=latent)
    blob0 = codec.encode(params, symbols, centers).bitstream
    assert codec_lib.deserialize_stream(blob0)[4] is not None  # tail mode
    hdr = 12                              # v9 fixed header (not shapewide)
    misdecoded = 0
    for seed in range(40):
        r = np.random.RandomState(1000 + seed)
        blob = bytearray(blob0)
        if seed % 3 == 2 and len(blob) - hdr > 4:       # even truncation
            cut = r.randint(1, (len(blob) - hdr) // 2) * 2
            blob = blob[:len(blob) - cut]
        else:
            for _ in range(r.randint(1, 4)):
                blob[hdr + r.randint(len(blob) - hdr)] ^= 1 << r.randint(8)
        try:
            got = codec.decode(params, bytes(blob), centers)
        except (AssertionError, ValueError, IndexError, OverflowError):
            continue
        if not np.array_equal(got, symbols):
            misdecoded += 1
    assert misdecoded == 0


# ---------------- native C++ runtime ----------------

def test_native_encode_matches_numpy():
    from imgcomp_cvpr_tpu.coding.native import build as native_build
    lib = native_build.get_lib()
    assert lib is not None, 'g++ available in this environment; build must work'
    rng = np.random.RandomState(7)
    T, M = 60, 9
    freq = np.zeros((T, M), np.uint32)
    start = np.zeros((T, M), np.uint32)
    active = rng.rand(T, M) < 0.7
    for j in range(M):
        n = active[:, j].sum()
        _, f, c = _random_tables(rng, n)
        s = np.array([rng.choice(6, p=ff / ff.sum()) for ff in f])
        freq[active[:, j], j] = f[np.arange(n), s]
        start[active[:, j], j] = c[np.arange(n), s]
    streams_np, states_np, k_np = rans.vectorized_encode(freq, start,
                                                         active)
    streams_cc, states_cc, k_cc = rans.encode_reverse(freq, start, active)
    np.testing.assert_array_equal(states_np, states_cc)
    np.testing.assert_array_equal(k_np, k_cc)
    for a, b in zip(streams_np, streams_cc):
        np.testing.assert_array_equal(a, b)


def test_native_decode_lane_matches_scalar():
    from imgcomp_cvpr_tpu.coding.native import build as native_build
    import ctypes
    lib = native_build.get_lib()
    assert lib is not None
    rng = np.random.RandomState(8)
    n = 200
    _, freq, cdf_low = _random_tables(rng, n)
    syms = np.array([rng.choice(6, p=f / f.sum()) for f in freq])
    words, state, k = rans.scalar_encode(syms, freq, cdf_low)
    assert k == 0
    words_arr = np.asarray(words, np.uint16)
    out = np.zeros(n, np.int32)
    lib.rans_decode_lane(
        n, 6,
        words_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), len(words),
        ctypes.c_uint32(state), ctypes.c_int32(k),
        np.ascontiguousarray(freq, np.uint32).ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        np.ascontiguousarray(cdf_low, np.uint32).ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    np.testing.assert_array_equal(out, syms)


def test_codec_batch_roundtrip(tiny_pc_setup):
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg)
    rng = np.random.RandomState(4)
    symbols = rng.randint(0, 6, size=(3,) + latent)
    results = codec.encode_batch(params, symbols, centers)
    assert len(results) == 3
    decoded = codec.decode_batch(params, [r.bitstream for r in results], centers)
    np.testing.assert_array_equal(decoded, symbols)
    # batch results identical to single-image results
    single = codec.encode(params, symbols[0], centers)
    assert single.bitstream == results[0].bitstream


# ---------------- cached codec ----------------

def test_cached_codec_roundtrip(tiny_pc_setup):
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg, impl='cached')
    rng = np.random.RandomState(5)
    symbols = rng.randint(0, 6, size=latent)
    result = codec.roundtrip(params, symbols, centers)
    assert result.num_bits > 0


def test_cached_codec_bits_close_to_direct(tiny_pc_setup):
    """Cached and direct implementations compute the same math in different
    op orders — bitstreams differ, but coded sizes must agree closely."""
    cfg, pc, params, centers, latent = tiny_pc_setup
    rng = np.random.RandomState(6)
    symbols = rng.randint(0, 6, size=latent)
    r_direct = codec_lib.LatentCodec(pc, cfg, impl='direct').encode(
        params, symbols, centers)
    r_cached = codec_lib.LatentCodec(pc, cfg, impl='cached').encode(
        params, symbols, centers)
    assert r_cached.theoretical_bits == pytest.approx(
        r_direct.theoretical_bits, rel=1e-3)


def test_cached_codec_batch_roundtrip(tiny_pc_setup):
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg, impl='cached')
    rng = np.random.RandomState(7)
    symbols = rng.randint(0, 6, size=(2,) + latent)
    results = codec.encode_batch(params, symbols, centers)
    decoded = codec.decode_batch(params, [r.bitstream for r in results], centers)
    np.testing.assert_array_equal(decoded, symbols)


# ---------------- ring codec (production path) ----------------

def test_ring_codec_roundtrip(tiny_pc_setup):
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg, impl='ring')
    rng = np.random.RandomState(9)
    symbols = rng.randint(0, 6, size=latent)
    result = codec.roundtrip(params, symbols, centers)
    assert result.num_bits > 0


def test_ring_codec_bits_close_to_direct(tiny_pc_setup):
    cfg, pc, params, centers, latent = tiny_pc_setup
    rng = np.random.RandomState(10)
    symbols = rng.randint(0, 6, size=latent)
    r_direct = codec_lib.LatentCodec(pc, cfg, impl='direct').encode(
        params, symbols, centers)
    r_ring = codec_lib.LatentCodec(pc, cfg, impl='ring').encode(
        params, symbols, centers)
    assert r_ring.theoretical_bits == pytest.approx(
        r_direct.theoretical_bits, rel=5e-3)


def test_ring_codec_batch_roundtrip(tiny_pc_setup):
    cfg, pc, params, centers, latent = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg, impl='ring')
    rng = np.random.RandomState(11)
    symbols = rng.randint(0, 6, size=(2,) + latent)
    results = codec.encode_batch(params, symbols, centers)
    decoded = codec.decode_batch(params, [r.bitstream for r in results], centers)
    np.testing.assert_array_equal(decoded, symbols)


def test_ring_codec_larger_latent(tiny_pc_setup):
    """Bigger volume exercises ring wraparound (T >> VR)."""
    cfg, pc, params, centers, _ = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg, impl='ring')
    rng = np.random.RandomState(12)
    symbols = rng.randint(0, 6, size=(6, 12, 16))
    codec.roundtrip(params, symbols, centers)


def test_device_encoder_matches_cpp(tiny_pc_setup):
    """On-device reverse rANS (rans.encode_reverse_scan) must produce the
    same streams/states as the C++/numpy host encoders."""
    rng = np.random.RandomState(21)
    T, M = 50, 7
    freq = np.zeros((T, M), np.uint32)
    start = np.zeros((T, M), np.uint32)
    active = rng.rand(T, M) < 0.75
    for j in range(M):
        n = active[:, j].sum()
        _, f, c = _random_tables(rng, n)
        s = np.array([rng.choice(6, p=ff / ff.sum()) for ff in f])
        freq[active[:, j], j] = f[np.arange(n), s]
        start[active[:, j], j] = c[np.arange(n), s]
    streams_ref, states_ref, _ = rans.encode_reverse(freq, start, active)
    buf, counts, states = jax.device_get(rans.encode_reverse_scan(
        jnp.asarray(freq), jnp.asarray(start), jnp.asarray(active)))
    np.testing.assert_array_equal(states, states_ref)
    for j in range(M):
        words = buf[j, :counts[j]][::-1]
        np.testing.assert_array_equal(words, streams_ref[j])


@pytest.mark.parametrize('latent', [(8, 4, 5),    # M < 64 (R = M path)
                                    (12, 10, 13),  # M padded to 64
                                    (5, 16, 9)])   # tall-thin grid
def test_ring_codec_shape_variety(tiny_pc_setup, latent):
    cfg, pc, params, centers, _ = tiny_pc_setup
    codec = codec_lib.LatentCodec(pc, cfg, impl='ring')
    rng = np.random.RandomState(hash(latent) % 2**31)
    symbols = rng.randint(0, 6, size=latent)
    codec.roundtrip(params, symbols, centers)


def test_codec_hi_config_channels():
    """cvpr/hi uses C=64 bottleneck channels (ref ae_configs/cvpr/hi)."""
    cfg, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    cfg = cfg.replace(arch_param__k=4)
    pc = probclass.ProbClassifier(cfg, num_centers=6)
    latent = (64, 5, 6)
    params = pc.init(jax.random.PRNGKey(3), (1, latent[1], latent[2], latent[0]))
    centers = np.linspace(-2, 2, 6).astype(np.float32)
    codec = codec_lib.LatentCodec(pc, cfg, impl='ring')
    rng = np.random.RandomState(13)
    codec.roundtrip(params, rng.randint(0, 6, size=latent), centers)


def test_codec_skewed_probabilities():
    """Near-deterministic CDFs (trained-model regime): freq hits the 1 floor
    and the 65530 ceiling."""
    cfg, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    cfg = cfg.replace(arch_param__k=4)
    pc = probclass.ProbClassifier(cfg, num_centers=6)
    latent = (4, 6, 7)
    params = pc.init(jax.random.PRNGKey(4), (1, latent[1], latent[2], latent[0]))
    # Scale up the output-layer weights to produce extreme logits.
    params = jax.tree.map(lambda x: x, params)
    import flax.serialization as fs
    d = fs.to_state_dict(params)
    d['params']['conv_out']['w'] = d['params']['conv_out']['w'] * 50.0
    d['params']['conv_out']['b'] = d['params']['conv_out']['b'] + 5.0
    params = fs.from_state_dict(params, d)
    centers = np.linspace(-2, 2, 6).astype(np.float32)
    codec = codec_lib.LatentCodec(pc, cfg, impl='ring')
    rng = np.random.RandomState(14)
    result = codec.roundtrip(params, rng.randint(0, 6, size=latent), centers)
    assert result.num_bits > 0


def test_schedule_causality_larger():
    sched = wavefront.build_schedule((6, 9, 11), 9, 'linear')
    wavefront.check_schedule_causality(sched, 9)
