"""Decide the x0=1 rANS tail-packing question on REAL model tables:
run the trained PC over a natural-content latent, quantize the CDFs,
split cells into R=32 lanes, and compare per-image flush cost
(stream words + packed states [+ k-table]) for x0=L vs x0=1.

Usage: python dev_probes/_probe25_x0.py [n_images]
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
from imgcomp_cvpr_tpu.coding import rans
from imgcomp_cvpr_tpu.models import autoencoder as ae_lib
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib

NI = int(sys.argv[1]) if len(sys.argv) > 1 else 4
R = 32

ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
ae = ae_lib.get_network_cls(ae_config)(ae_config)
pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
h, w = 512, 768
rng = np.random.RandomState(0)
x = jnp.asarray(bench.natural_images(rng, NI, h, w))
params, batch_stats = bench.load_trained(bench.ASSET)
ae_vars = {'params': jax.device_put(params['ae']),
           'batch_stats': jax.device_put(batch_stats)}
pc_vars = {'params': jax.device_put(params['pc'])}
centers = jnp.asarray(jax.device_get(
    ae_vars['params']['encoder']['centers']))


from imgcomp_cvpr_tpu.models.probclass import auto_pad_value


@jax.jit
def latent_and_probs(v, pv, x):
    e = ae.apply(v, x, False, method='encode')
    # bulk parallel logits over the quantized volume (theoretical path)
    pad_value = auto_pad_value(pc_config, centers, pv)
    logits = pc.logits(pv, e.qhard, pad_value)     # (B, D, H', W', L)
    probs = jax.nn.softmax(logits, axis=-1)
    # symbols to (B, D, H', W') to match the logits layout
    sym_dhw = jnp.transpose(e.symbols, (0, 3, 1, 2))
    return sym_dhw, probs


syms, probs = latent_and_probs(ae_vars, pc_vars, x)
syms = np.asarray(jax.device_get(syms))
probs = np.asarray(jax.device_get(probs), np.float32)
print('syms', syms.shape, 'probs', probs.shape)

freq, cl = rans.quantize_cdf(jnp.asarray(probs))
freq = np.asarray(freq, np.uint32)
cl = np.asarray(cl, np.uint32)


def pack_cost_v7(xf):
    hi = int(xf) >> 16
    return 16 + 4 + max(hi.bit_length() - 1, 0)


def pack_cost_wide(xf):
    # v8 wide: 5-bit hi length (0 allowed) + lo16
    hi = int(xf) >> 16
    ln = hi.bit_length()
    return 16 + 5 + max(ln - 1, 0)


for i in range(NI):
    s = syms[i].reshape(-1)
    f_all = freq[i].reshape(-1, freq.shape[-1])
    c_all = cl[i].reshape(-1, cl.shape[-1])
    n = len(s)
    # lanes: cells round-robin over R lanes (proxy for the wavefront map)
    bits = {}
    ks = []
    for x0 in (rans.RANS_L, 1):
        tot = 0
        for r in range(R):
            idx = np.arange(r, n, R)
            words, xf, k = rans.scalar_encode(s[idx], f_all[idx], c_all[idx],
                                              x0=x0)
            tot += 16 * len(words)
            tot += pack_cost_v7(xf) if x0 == rans.RANS_L \
                else pack_cost_wide(xf)
            if x0 == 1:
                ks.append(k)
        bits[x0] = tot
    kmax = max(ks)
    kbits = R * max(kmax.bit_length(), 1) + 3
    theo = float(np.sum(-np.log2(np.maximum(
        probs[i].reshape(-1, probs.shape[-1])[np.arange(n), s], 1e-12))))
    print(f'img {i}: theo {theo:,.0f} bits  x0=L {bits[rans.RANS_L]:,} '
          f'x0=1 {bits[1]:,}  saved {bits[rans.RANS_L] - bits[1]}  '
          f'ktable {kbits}  net {bits[rans.RANS_L] - bits[1] - kbits}  '
          f'k(mean/max) {np.mean(ks):.1f}/{kmax}  '
          f'ovh_L {100 * (bits[rans.RANS_L] + 120 - theo) / theo:.3f}%  '
          f'ovh_1 {100 * (bits[1] + kbits + 128 - theo) / theo:.3f}%')
