#!/usr/bin/env python
"""Benchmark: end-to-end encode+decode throughput on Kodak-sized images.

Measures the full codec path on one chip — AE encode, on-device wavefront
entropy encode (CDF scan + reverse rANS on the host), on-device wavefront
entropy decode, AE decode — on a batch of 768x512 images with the flagship
model (ae cvpr/low + pc cvpr/res_shallow). Correctness is gated first: the
batch must round-trip bit-exactly (CRC-verified) before timing.

Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": x}

Baseline: the reference codes one Kodak image in ~350 s (encode) + ~200 s
(decode) => 0.393 MP / 550 s = 7.15e-4 MP/s (BASELINE.md; ref README.md:65-66).
"""

import json
import sys
import time

import numpy as np

BASELINE_MP_PER_S = 0.393216 / 550.0
BATCH = 16


def main():
    import jax
    # Persistent compilation cache: the wavefront-scan executables are large;
    # recompiling them dominates cold-start time otherwise.
    import os
    os.makedirs('.jax_cache', exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', os.path.abspath('.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    from imgcomp_cvpr_tpu.coding import codec as codec_lib
    from imgcomp_cvpr_tpu.models import autoencoder as ae_lib
    from imgcomp_cvpr_tpu.models import probclass as pc_lib
    from imgcomp_cvpr_tpu.utils import config as config_lib

    ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
    pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    ae = ae_lib.get_network_cls(ae_config)(ae_config)
    pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
    codec = codec_lib.LatentCodec(pc, pc_config)

    h, w = 512, 768  # Kodak orientation
    mp = BATCH * h * w / 1e6
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, h, w, 3).astype(np.float32) * 255.0)

    ae_vars = ae.init(jax.random.PRNGKey(0), x[:1], False)
    pc_vars = pc.init(jax.random.PRNGKey(1),
                      (1, h // 8, w // 8, ae_config.num_chan_bn))
    centers = np.asarray(jax.device_get(ae_vars['params']['encoder']['centers']))

    @jax.jit
    def ae_encode(ae_vars, x):
        return ae.apply(ae_vars, x, False, method='encode')

    @jax.jit
    def ae_decode(ae_vars, q):
        return ae.apply(ae_vars, q, False, method='decode')

    @jax.jit
    def syms_chw(enc_symbols):
        # NHWC int32 -> (B, C, H, W) int8 ON DEVICE (the codec path is
        # device-resident: symbols and decoded volumes never cross the
        # host link; container checksums are computed on device).
        return jnp.transpose(enc_symbols, (0, 3, 1, 2)).astype(jnp.int8)

    @jax.jit
    def q_from_syms(syms_dev_chw):
        s_nhwc = jnp.transpose(syms_dev_chw, (0, 2, 3, 1)).astype(jnp.int32)
        return jnp.asarray(centers)[s_nhwc]

    def full_encode(imgs):
        enc = ae_encode(ae_vars, imgs)
        syms = syms_chw(enc.symbols)
        return codec.encode_batch(pc_vars, syms, centers), \
            np.asarray(jax.device_get(syms))

    def full_decode(bitstreams):
        syms = codec.decode_batch(pc_vars, bitstreams, centers,
                                  device_out=True)  # checksum-verified
        return jax.block_until_ready(ae_decode(ae_vars, q_from_syms(syms)))

    # Warmup (compile) + correctness gate: bit-exact round-trip.
    results, syms_in = full_encode(x)
    decoded_syms = codec.decode_batch(pc_vars, [r.bitstream for r in results],
                                      centers)
    np.testing.assert_array_equal(decoded_syms, syms_in)
    _ = full_decode([r.bitstream for r in results])
    syms_dev = syms_chw(ae_encode(ae_vars, x).symbols)
    jax.block_until_ready(syms_dev)

    # Timed: software-pipelined stream of batches — host serialize/parse of
    # batch i overlaps the device scans of batch i+1 (async dispatch).
    # Timed loop, depth-2 software pipeline: the NEXT batch's encode is
    # queued before finishing the current one, so the device never idles
    # while the host serializes/parses streams; decode results are
    # finished one slot late for the same reason.
    n_iter = 8
    # fill the pipeline before timing (one untimed cycle)
    wh = codec.encode_batch_submit(pc_vars, syms_dev, centers)
    wr = codec.encode_batch_finish(wh)
    wd = codec.decode_batch_submit(pc_vars, [r.bitstream for r in wr], centers)
    codec.decode_batch_finish(wd, device_out=True)
    t0 = time.time()
    enc_h = codec.encode_batch_submit(pc_vars, syms_dev, centers)
    dec_h = None
    x_out = None
    for i in range(n_iter):
        enc_next = (codec.encode_batch_submit(pc_vars, syms_dev, centers)
                    if i + 1 < n_iter else None)
        rs = codec.encode_batch_finish(enc_h)
        enc_h = enc_next
        dec_prev, dec_h = dec_h, codec.decode_batch_submit(
            pc_vars, [r.bitstream for r in rs], centers)
        if dec_prev is not None:
            syms_out = codec.decode_batch_finish(dec_prev, device_out=True)
            x_out = ae_decode(ae_vars, q_from_syms(syms_out))
    syms_out = codec.decode_batch_finish(dec_h, device_out=True)
    x_out = ae_decode(ae_vars, q_from_syms(syms_out))
    jax.block_until_ready(x_out)
    dt = (time.time() - t0) / n_iter
    # AE encode time is measured separately and added (the pipeline reuses
    # precomputed symbols to keep the loop pure codec + AE decode).
    t0 = time.time()
    for _ in range(n_iter):
        jax.block_until_ready(ae_encode(ae_vars, x).symbols)
    dt += (time.time() - t0) / n_iter

    mp_per_s = mp / dt
    print(json.dumps({
        'metric': 'kodak_encode_decode_throughput',
        'value': round(mp_per_s, 4),
        'unit': 'MP/s',
        'vs_baseline': round(mp_per_s / BASELINE_MP_PER_S, 1),
    }))


if __name__ == '__main__':
    sys.exit(main())
