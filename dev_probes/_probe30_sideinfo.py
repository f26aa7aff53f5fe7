"""Decompose the container side-info of REAL bench streams (trained
model, natural content, Kodak shape): per-block byte/bit costs (header /
state lo / state descriptors+mantissas / k-table / words), the empirical
distributions of the state-hi bit-lengths and the k-table residuals, and
each block's ideal entropy — i.e. how far the v11 container sits from
its own floor and where the measured real-vs-theory overhead lives.

Usage: python dev_probes/_probe30_sideinfo.py [B]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import bench
from imgcomp_cvpr_tpu.coding import codec as codec_lib
from imgcomp_cvpr_tpu.models import autoencoder as ae_lib
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
ae = ae_lib.get_network_cls(ae_config)(ae_config)
pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
codec = codec_lib.LatentCodec(pc, pc_config)

h, w = 512, 768
rng = np.random.RandomState(0)
x = jnp.asarray(bench.natural_images(rng, B, h, w))
params, batch_stats = bench.load_trained(bench.ASSET)
ae_vars = {'params': jax.device_put(params['ae']),
           'batch_stats': jax.device_put(batch_stats)}
pc_vars = {'params': jax.device_put(params['pc'])}
centers = np.asarray(jax.device_get(ae_vars['params']['encoder']['centers']))

enc_out = ae.apply(ae_vars, x, False, method='encode')
syms = np.asarray(jax.device_get(
    jnp.transpose(enc_out.symbols, (0, 3, 1, 2)))).astype(np.int64)
print(f'latent {syms.shape[1:]}, B={B}', flush=True)

results = codec.encode_batch(pc_vars, syms, centers)


def ent_bits(vals):
    """Ideal entropy in bits of the empirical distribution of vals."""
    _, cnt = np.unique(vals, return_counts=True)
    p = cnt / cnt.sum()
    return float(-(p * np.log2(p)).sum()) * len(vals)


tot = dict(theory=0.0, real=0.0, hdr=0, lo=0, desc_mant=0, ktab=0,
           words=0, desc_ent=0.0, ktab_ent=0.0, kres_ent=0.0)
for i, res in enumerate(results):
    blob = res.bitstream
    shape, words, states, crc, k = codec_lib.deserialize_stream(blob)
    r = len(states)
    hdr_bits = 88       # 11-byte narrow header
    lo_bits = 16 * r
    # states block size on the wire
    packed = codec_lib._pack_states(states, wide=k is not None)
    desc_mant_bits = len(packed) * 8 - lo_bits
    hi = states >> 16
    ln = np.asarray([int(v).bit_length() for v in hi])
    mant_bits = int(np.maximum(ln - 1, 0).sum())
    ktab_bits = len(codec_lib._pack_ktable(k)) * 8 if k is not None else 0
    word_bits = 16 * len(words)
    tot['theory'] += res.theoretical_bits
    tot['real'] += len(blob) * 8
    tot['hdr'] += hdr_bits
    tot['lo'] += lo_bits
    tot['desc_mant'] += desc_mant_bits
    tot['ktab'] += ktab_bits
    tot['words'] += word_bits
    tot['desc_ent'] += ent_bits(ln) + mant_bits
    if k is not None:
        kres = k - int(np.median(k))
        tot['ktab_ent'] += ent_bits(k)
        tot['kres_ent'] += ent_bits(kres)
        if i == 0:
            print(f'img0: ln counts {np.bincount(ln, minlength=17)}')
            print(f'img0: k median {int(np.median(k))} res '
                  f'min/max {kres.min()}/{kres.max()} '
                  f'std {kres.std():.1f}')
            print(f'img0: k sorted-by-lane deltas std '
                  f'{np.diff(k.astype(np.int64)).std():.1f}')

n = B
print(f'\nper image (avg over {n}):')
print(f'  theory          {tot["theory"]/n:12.1f} bits')
print(f'  real            {tot["real"]/n:12.1f} bits  '
      f'(overhead {100*(tot["real"]/tot["theory"]-1):.3f}%)')
print(f'  header          {tot["hdr"]/n:12.1f}')
print(f'  state lo words  {tot["lo"]/n:12.1f}')
print(f'  state desc+mant {tot["desc_mant"]/n:12.1f}   '
      f'(ideal desc-entropy + mant: {tot["desc_ent"]/n:.1f})')
print(f'  k-table         {tot["ktab"]/n:12.1f}   '
      f'(ideal entropy of k: {tot["ktab_ent"]/n:.1f}, of k-med residual: '
      f'{tot["kres_ent"]/n:.1f})')
print(f'  stream words    {tot["words"]/n:12.1f}')
print(f'  words+states-vs-theory surplus '
      f'{(tot["words"]+tot["lo"]+tot["desc_mant"]-tot["theory"])/n:12.1f} '
      f'bits (info carried by states offsets the flush)', flush=True)
