"""Pallas monolith codec tests (interpret mode on CPU).

Oracles mirror the reference's runtime self-checks (ref:
bit_counter.py:51-68): bit-exact symbol round trip, and theoretical bits
consistent with the XLA 'direct' implementation's CDF tables.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.coding import codec as codec_lib
from imgcomp_cvpr_tpu.coding import pallas_kernel as pk
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib


def _setup(shape=(4, 6, 7), L=6, k=8, seed=0, use_centers_pad=True):
    pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    pc_config = pc_config.replace(arch_param__k=k,
                                  use_centers_for_padding=use_centers_pad)
    pc = pc_lib.ProbClassifier(pc_config, L)
    rng = np.random.RandomState(seed)
    pc_params = pc.init(jax.random.PRNGKey(seed + 1),
                        (1, shape[1], shape[2], shape[0]))
    centers = np.linspace(-2.0, 2.0, L).astype(np.float32)
    return pc, pc_config, pc_params, centers, rng


def test_schedule_invariants():
    for shape in [(4, 6, 7), (3, 5, 5), (8, 4, 9)]:
        sched = pk.build_pallas_schedule(shape)
        n = int(np.prod(shape))
        active = sched.active[:, 0, :] != 0
        assert int(active.sum()) == n
        # idx map is a permutation over active cells (asserted at build too)
        on = np.sort(sched.idx_map[active])
        np.testing.assert_array_equal(on, np.arange(n))
        # sub-iteration chunks are disjoint and their flags cover every
        # active cell
        subit = sched.table[:, 0, pk._TBL_SUBIT:].astype(bool)
        covered = np.zeros_like(active)
        for si, off in enumerate(sched.chunk_offs):
            covered[:, off:off + pk.R] |= subit[:, si:si + 1]
        assert (covered | ~active).all()


def test_pallas_roundtrip_bit_exact():
    pc, cfg, params, centers, rng = _setup()
    syms = rng.randint(0, 6, size=(2, 4, 6, 7)).astype(np.int8)
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    res = codec.encode_batch(params, syms, centers)
    dec = codec.decode_batch(params, [r.bitstream for r in res], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))


def test_pallas_matches_direct_theoretical_bits():
    pc, cfg, params, centers, rng = _setup(seed=3)
    syms = rng.randint(0, 6, size=(1, 4, 6, 7)).astype(np.int8)
    direct = codec_lib.LatentCodec(pc, cfg, impl='direct')
    pallas = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    td = direct.encode_batch(params, syms, centers)[0].theoretical_bits
    tp = pallas.encode_batch(params, syms, centers)[0].theoretical_bits
    # Different float summation orders => CDFs may differ in ulp-edge cases.
    assert abs(td - tp) / td < 2e-3, (td, tp)


def test_pallas_zero_pad_value():
    pc, cfg, params, centers, rng = _setup(use_centers_pad=False, seed=5)
    syms = rng.randint(0, 6, size=(1, 4, 6, 7)).astype(np.int8)
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    res = codec.encode_batch(params, syms, centers)
    dec = codec.decode_batch(params, [r.bitstream for r in res], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))


def test_pallas_c64():
    pc, cfg, params, centers, rng = _setup(shape=(9, 5, 6), seed=7)
    syms = rng.randint(0, 6, size=(1, 9, 5, 6)).astype(np.int8)
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    res = codec.encode_batch(params, syms, centers)
    dec = codec.decode_batch(params, [r.bitstream for r in res], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))


def test_pallas_nondefault_L13():
    """num_centers is a config knob (every shipped config uses 6, ref
    ae_configs/base:21) — an odd L > 8 exercises the one-hot iota
    bounds, CDF table sizing, and the bits(L) stream-row cap."""
    pc, cfg, params, centers, rng = _setup(L=13, seed=11)
    syms = rng.randint(0, 13, size=(2, 4, 6, 7)).astype(np.int8)
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    res = codec.encode_batch(params, syms, centers)
    dec = codec.decode_batch(params, [r.bitstream for r in res], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))
    # theory consistency against the 'direct' oracle at this L
    td = codec_lib.LatentCodec(pc, cfg, impl='direct').encode_batch(
        params, syms, centers)[0].theoretical_bits
    assert abs(td - res[0].theoretical_bits) / td < 2e-3


def test_container_self_routing():
    """A pallas-encoded stream decodes through a ring-configured codec and
    vice versa (container v4 impl id, VERDICT round-1 'format wart' fix)."""
    pc, cfg, params, centers, rng = _setup(seed=9)
    syms = rng.randint(0, 6, size=(1, 4, 6, 7)).astype(np.int8)
    ring = codec_lib.LatentCodec(pc, cfg, impl='ring')
    pallas = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    res_p = pallas.encode_batch(params, syms, centers)
    res_r = ring.encode_batch(params, syms, centers)
    assert codec_lib.stream_impl_id(res_p[0].bitstream) == codec_lib.IMPL_PALLAS
    assert codec_lib.stream_impl_id(res_r[0].bitstream) == codec_lib.IMPL_RING
    dec_a = ring.decode_batch(params, [res_p[0].bitstream], centers)
    dec_b = pallas.decode_batch(params, [res_r[0].bitstream], centers)
    np.testing.assert_array_equal(dec_a[0], syms[0].astype(np.int32))
    np.testing.assert_array_equal(dec_b[0], syms[0].astype(np.int32))


def test_batch_size_independence():
    """Pallas streams decode at any batch size (the batch index never enters
    the kernel's per-step math)."""
    pc, cfg, params, centers, rng = _setup(seed=11)
    syms = rng.randint(0, 6, size=(3, 4, 6, 7)).astype(np.int8)
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    res = codec.encode_batch(params, syms, centers)      # encoded at B=3
    one = codec.decode(params, res[1].bitstream, centers)  # decoded at B=1
    np.testing.assert_array_equal(one, syms[1].astype(np.int32))


def test_bsub_batched_kernel_stream_invariance(monkeypatch):
    """The bsub=2 segment-batched bf16 kernel must produce bitwise
    identical streams to the bsub=1 bf16 kernel (same precision): real
    cells never read across segment boundaries."""
    pc, cfg, params, centers, rng = _setup(seed=11)
    syms = rng.randint(0, 6, size=(4, 4, 6, 7)).astype(np.int8)

    from imgcomp_cvpr_tpu.coding.pallas_codec import PallasCoder

    monkeypatch.setenv('IMGCOMP_PALLAS_BSUB', '4')
    res4 = PallasCoder(pc, cfg).encode_batch(params, syms, centers)
    monkeypatch.setenv('IMGCOMP_PALLAS_BSUB', '2')
    res2 = PallasCoder(pc, cfg).encode_batch(params, syms, centers)
    monkeypatch.setenv('IMGCOMP_PALLAS_BSUB', '1')
    res1 = PallasCoder(pc, cfg).encode_batch(params, syms, centers)
    monkeypatch.delenv('IMGCOMP_PALLAS_BSUB')
    for a, b, c in zip(res2, res1, res4):
        assert a.bitstream == b.bitstream
        assert c.bitstream == b.bitstream
        assert a.theoretical_bits == pytest.approx(b.theoretical_bits,
                                                   rel=1e-6)

    # auto policy (even batch -> bf16 bsub=2) round-trips bit-exactly and
    # cross-decodes at any batch size, including odd ones.
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    dec = codec.decode_batch(params, [r.bitstream for r in res2], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))
    dec1 = codec.decode_batch(params, [res2[3].bitstream], centers)
    np.testing.assert_array_equal(dec1[0], syms[3].astype(np.int32))


def test_f8_rings_bsub8_stream_invariance(monkeypatch):
    """IMGCOMP_PALLAS_PREC=f8 selects f8_e4m3 inner rings (container prec
    byte 2) with the 8-image kernel (opt-in: a measured throughput
    negative on the v5e — see pallas_codec._encode_prec); streams must be
    bitwise invariant across bsub within the f8 precision and round-trip
    at any batch size."""
    pc, cfg, params, centers, rng = _setup(seed=14)
    syms = rng.randint(0, 6, size=(8, 4, 6, 7)).astype(np.int8)

    from imgcomp_cvpr_tpu.coding.pallas_codec import PallasCoder

    monkeypatch.setenv('IMGCOMP_PALLAS_PREC', 'f8')
    res8 = PallasCoder(pc, cfg).encode_batch(params, syms, centers)
    assert all(codec_lib.stream_prec(r.bitstream) == 2 for r in res8)
    monkeypatch.setenv('IMGCOMP_PALLAS_BSUB', '1')
    res1 = PallasCoder(pc, cfg).encode_batch(params, syms, centers)
    monkeypatch.delenv('IMGCOMP_PALLAS_BSUB')
    monkeypatch.delenv('IMGCOMP_PALLAS_PREC')
    for a, b in zip(res8, res1):
        assert a.bitstream == b.bitstream

    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    dec = codec.decode_batch(params, [r.bitstream for r in res8], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))
    # odd-batch decode of an f8 stream routes by the container prec byte
    dec3 = codec.decode_batch(params, [r.bitstream for r in res8[:3]],
                              centers)
    np.testing.assert_array_equal(dec3, syms[:3].astype(np.int32))


def test_odd_batch_uses_f32_and_roundtrips():
    pc, cfg, params, centers, rng = _setup(seed=12)
    syms = rng.randint(0, 6, size=(3, 4, 6, 7)).astype(np.int8)
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    res = codec.encode_batch(params, syms, centers)
    assert all(codec_lib.stream_prec(r.bitstream) == 0 for r in res)
    dec = codec.decode_batch(params, [r.bitstream for r in res], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))


def test_prec_forced_f32(monkeypatch):
    monkeypatch.setenv('IMGCOMP_PALLAS_PREC', 'f32')
    pc, cfg, params, centers, rng = _setup(seed=13)
    syms = rng.randint(0, 6, size=(2, 4, 6, 7)).astype(np.int8)
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    res = codec.encode_batch(params, syms, centers)
    assert all(codec_lib.stream_prec(r.bitstream) == 0 for r in res)
    dec = codec.decode_batch(params, [r.bitstream for r in res], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))


def test_enc_parallel_matches_shared_executable(monkeypatch):
    """The chunk-parallel teacher-forced encode kernel must emit byte-
    identical streams to the shared encode/decode executable (its logits ->
    CDF pipeline is the same program; verified bit-exact on real TPU too)."""
    pc, cfg, params, centers, rng = _setup(seed=21)
    syms = rng.randint(0, 6, size=(2, 4, 6, 7)).astype(np.int8)

    from imgcomp_cvpr_tpu.coding.pallas_codec import PallasCoder
    res_par = PallasCoder(pc, cfg).encode_batch(params, syms, centers)
    monkeypatch.setenv('IMGCOMP_PALLAS_ENCPAR', '0')
    res_shr = PallasCoder(pc, cfg).encode_batch(params, syms, centers)
    for a, b in zip(res_par, res_shr):
        assert a.bitstream == b.bitstream
    codec = codec_lib.LatentCodec(pc, cfg, impl='pallas')
    dec = codec.decode_batch(params, [r.bitstream for r in res_par], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))


def test_presel_prediction_paths():
    """Repeated encodes reuse the pre-dispatched stream-row gather
    (submit-time presel); an underprediction falls back to an exact
    re-gather at finish. Streams must be identical either way."""
    pc, cfg, params, centers, rng = _setup(seed=17)
    syms = rng.randint(0, 6, size=(2, 4, 6, 7)).astype(np.int8)

    from imgcomp_cvpr_tpu.coding.pallas_codec import PallasCoder
    coder = PallasCoder(pc, cfg)
    first = coder.encode_batch(params, syms, centers)   # no prediction yet
    assert coder._rneed_pred                            # learned from batch 1
    second = coder.encode_batch(params, syms, centers)  # presel hit
    for a, b in zip(first, second):
        assert a.bitstream == b.bitstream
    # Force an underprediction: presel (dispatched with 1 row) covers too
    # few rows — any non-empty stream needs >= 2 (rneed = ceil/128 + 1) —
    # so finish must detect pred < rneed_act and re-gather exactly.
    for key in coder._rneed_pred:
        coder._rneed_pred[key] = 1
    third = coder.encode_batch(params, syms, centers)
    for a, b in zip(first, third):
        assert a.bitstream == b.bitstream
    dec = codec_lib.LatentCodec(pc, cfg, impl='pallas').decode_batch(
        params, [r.bitstream for r in second], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))


def test_dec_only_matches_shared_executable(monkeypatch):
    """The decode-only kernel variant (no freq/cdf table outputs, no
    teacher-symbol input) must recover byte-identical symbol volumes from
    the same streams as the shared mode-flag executable (its per-symbol
    math is the same program; verified bit-exact on real TPU too)."""
    pc, cfg, params, centers, rng = _setup(seed=23)
    syms = rng.randint(0, 6, size=(2, 4, 6, 7)).astype(np.int8)

    from imgcomp_cvpr_tpu.coding.pallas_codec import PallasCoder
    res = PallasCoder(pc, cfg).encode_batch(params, syms, centers)
    streams = [r.bitstream for r in res]
    dec_split = PallasCoder(pc, cfg).decode_batch(params, streams, centers)
    monkeypatch.setenv('IMGCOMP_PALLAS_DECSPLIT', '0')
    dec_shared = PallasCoder(pc, cfg).decode_batch(params, streams, centers)
    np.testing.assert_array_equal(dec_split, dec_shared)
    np.testing.assert_array_equal(dec_split, syms.astype(np.int32))


def test_tail_packing_pallas(monkeypatch):
    """Container v8 tail packing through the pallas kernels (interpret
    mode): x0=1 roundtrip with a real k-table, legacy (x0=RANS_L) encode
    through the SAME executables, and a mixed tail/legacy decode batch.
    TPU-side verification is bench.py's CRC gate + the ab_streams
    payload-only run (legacy payloads byte-identical to HEAD)."""
    pc, pc_config, pc_params, centers, rng = _setup()
    syms = rng.randint(0, 6, size=(2, 4, 6, 7)).astype(np.int8)
    syms[1] = 3          # near-deterministic image: long warmups
    monkeypatch.setattr(codec_lib, 'TAIL_MIN_LANE_SYMBOLS', 0)
    codec = codec_lib.LatentCodec(pc, pc_config, impl='pallas')
    res = codec.encode_batch(pc_params, syms, centers)
    ks = [codec_lib.deserialize_stream(r.bitstream)[4] for r in res]
    assert all(k is not None for k in ks)
    assert max(int(k.max()) for k in ks) > 0
    dec = codec.decode_batch(pc_params, [r.bitstream for r in res], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))

    monkeypatch.setenv('IMGCOMP_RANS_X0', 'L')
    codec_l = codec_lib.LatentCodec(pc, pc_config, impl='pallas')
    res_l = codec_l.encode_batch(pc_params, syms, centers)
    assert all(codec_lib.deserialize_stream(r.bitstream)[4] is None
               for r in res_l)
    mixed = codec.decode_batch(
        pc_params, [res[0].bitstream, res_l[1].bitstream], centers)
    np.testing.assert_array_equal(mixed[0], syms[0].astype(np.int32))
    np.testing.assert_array_equal(mixed[1], syms[1].astype(np.int32))
