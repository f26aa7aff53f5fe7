"""Per-stage codec profiling (the reference's tracing/profiling analog,
SURVEY.md §5; ref train.py:243-276 used TF FULL_TRACE + img/s timers).

Times each stage of the encode+decode path separately on the current
backend and prints a JSON report: AE encode, forward CDF scan, on-device
reverse rANS, stream fetch + serialize, decode scan, symbol unpack, AE
decode. Use `--trace DIR` to additionally capture a jax.profiler trace.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def profile(batch: int = 8, h: int = 512, w: int = 768, iters: int = 3,
            trace_dir: str = None) -> dict:
    import os
    import jax
    cache = os.path.abspath('.jax_cache')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    from ..coding import codec as codec_lib
    from ..coding import rans
    from ..models import autoencoder as ae_lib
    from ..models import probclass as pc_lib
    from ..utils import config as config_lib

    ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
    pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    ae = ae_lib.get_network_cls(ae_config)(ae_config)
    pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
    codec = codec_lib.LatentCodec(pc, pc_config)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32) * 255.0)
    ae_vars = ae.init(jax.random.PRNGKey(0), x[:1], False)
    pc_vars = pc.init(jax.random.PRNGKey(1),
                      (1, h // 8, w // 8, ae_config.num_chan_bn))
    centers = np.asarray(jax.device_get(ae_vars['params']['encoder']['centers']))
    latent = (ae_config.num_chan_bn, h // 8, w // 8)

    enc_fn = jax.jit(lambda v, xx: ae.apply(v, xx, False, method='encode'))
    dec_fn = jax.jit(lambda v, q: ae.apply(v, q, False, method='decode'))

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.time() - t0) / iters, out

    report = {'batch': batch, 'image': [h, w],
              'megapixels': batch * h * w / 1e6}

    if trace_dir:
        jax.profiler.start_trace(trace_dir)

    t, enc = timed(enc_fn, ae_vars, x)
    report['ae_encode_s'] = round(t, 4)
    syms = np.transpose(np.asarray(jax.device_get(enc.symbols)), (0, 3, 1, 2))

    run, sched = codec._batched_scan_fn(latent)
    encode_streams, theoretical_bits, pack_syms, pad_streams = \
        codec._device_helpers(latent)
    r = rans.R_LANES if sched.M >= rans.R_LANES else sched.M
    streams_dummy = jnp.zeros((batch, sched.T * sched.M), jnp.uint32)
    states_dummy = jnp.full((batch, r), rans.RANS_L, jnp.uint32)
    ts = jnp.asarray(syms.reshape(batch, -1), jnp.int8)

    thresh_dummy = jnp.full((batch, r), np.iinfo(np.int32).max // 2,
                            jnp.int32)   # encode: pull threshold never binds

    t, fwd = timed(lambda: run(pc_vars, jnp.asarray(centers), ts,
                               streams_dummy, states_dummy, jnp.int32(1),
                               thresh_dummy))
    report['cdf_scan_s'] = round(t, 4)
    _, freq_sel, start_sel, _ = fwd
    t, _ = timed(encode_streams, freq_sel, start_sel)
    report['reverse_rans_scan_s'] = round(t, 4)

    t0 = time.time()
    results = codec.encode_batch(pc_vars, syms, centers)
    report['encode_batch_total_s'] = round(time.time() - t0, 4)

    t0 = time.time()
    decoded = codec.decode_batch(pc_vars, [res.bitstream for res in results],
                                 centers)
    report['decode_batch_total_s'] = round(time.time() - t0, 4)
    np.testing.assert_array_equal(decoded, syms)

    t, q_dummy = timed(dec_fn, ae_vars, enc.qhard)
    report['ae_decode_s'] = round(t, 4)

    if trace_dir:
        jax.profiler.stop_trace()

    total = (report['encode_batch_total_s'] + report['decode_batch_total_s']
             + report['ae_encode_s'] + report['ae_decode_s'])
    report['end_to_end_mp_per_s'] = round(report['megapixels'] / total, 3)
    report['steps_per_scan'] = sched.T
    report['lanes'] = sched.M
    report['rans_lanes'] = int(r)
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--trace', help='Directory for a jax.profiler trace.')
    flags = p.parse_args()
    print(json.dumps(profile(batch=flags.batch, trace_dir=flags.trace),
                     indent=1))


if __name__ == '__main__':
    main()
