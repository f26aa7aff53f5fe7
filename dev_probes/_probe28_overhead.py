"""Probe: decompose container overhead bits on a realistic stream.

Encodes natural-statistics Kodak-size images with the trained 9k-step
model on CPU (ring impl), then splits each container into header /
packed-states / k-table / stream-words and reports each block vs the
theoretical bits, plus the k distribution across lanes (this probe's v8
numbers sized the v9 bit-packed header + delta k-table).

Usage: python dev_probes/_probe28_overhead.py [n_images]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402

from bench import natural_images, load_trained, ASSET  # noqa: E402
from imgcomp_cvpr_tpu.coding import codec as codec_lib  # noqa: E402
from imgcomp_cvpr_tpu.models import autoencoder as ae_lib  # noqa: E402
from imgcomp_cvpr_tpu.models import probclass as pc_lib  # noqa: E402
from imgcomp_cvpr_tpu.utils import config as config_lib  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2
h, w = 512, 768

ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
ae = ae_lib.get_network_cls(ae_config)(ae_config)
pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
codec = codec_lib.LatentCodec(pc, pc_config)

params, batch_stats = load_trained(ASSET)
ae_vars = {'params': params['ae'], 'batch_stats': batch_stats}
pc_vars = {'params': params['pc']}
centers = np.asarray(ae_vars['params']['encoder']['centers'])

rng = np.random.RandomState(0)
x = jnp.asarray(natural_images(rng, N, h, w))
enc = jax.jit(lambda v, x: ae.apply(v, x, False, method='encode'))(ae_vars, x)
syms = np.asarray(jnp.transpose(enc.symbols, (0, 3, 1, 2)).astype(jnp.int8))
print('symbols:', syms.shape, flush=True)

results = codec.encode_batch(pc_vars, syms, centers)

for i, r in enumerate(results):
    data = r.bitstream
    theo = r.theoretical_bits
    shape, words, states, crc, k = codec_lib.deserialize_stream(data)
    rr = (int.from_bytes(data[:4], 'little') >> 20) & 0x7F   # v9 header
    # re-measure block sizes by re-serializing pieces
    packed = codec_lib._pack_states(states, wide=k is not None)
    states_bytes = len(packed) if len(packed) <= 4 * rr else 4 * rr
    if k is not None:
        kmin = int(k.min())
        kw = max(1, int(k.max() - kmin).bit_length())
        ktab_bytes = 2 + (4 + len(k) * kw + 7) // 8
    else:
        kw, ktab_bytes = 0, 0
    header_bytes = 12
    stream_bytes = len(words) * 2
    total_bits = len(data) * 8
    print(f'img {i}: total {total_bits} bits, theo {theo:.0f}, '
          f'overhead {total_bits / theo - 1:+.4%}')
    print(f'  header {header_bytes * 8}b  states {states_bytes * 8}b '
          f'(lo {2 * rr * 8}b + hi-packed {states_bytes * 8 - 2 * rr * 8}b)  '
          f'ktab {ktab_bytes * 8}b (kw={kw})  stream {stream_bytes * 8}b')
    if k is not None:
        k = np.asarray(k, np.int64)
        dmin = int(k.min())
        span = int(k.max() - k.min())
        kw_delta = max(1, span.bit_length())
        new_ktab = 1 + 2 + (len(k) * kw_delta + 7) // 8  # kw byte + u16 base
        print(f'  k: min {dmin} max {int(k.max())} span {span} -> '
              f'delta kw {kw_delta}: ktab {new_ktab * 8}b '
              f'(saves {(ktab_bytes - new_ktab) * 8}b)')
        # hypothetical: subtract theoretical warmup information? no — k is
        # pure side info. Also report states info content estimate.
        info = sum(max(0.0, np.log2(float(s))) for s in states)
        print(f'  states info content ~{info:.0f}b of '
              f'{states_bytes * 8}b packed')
