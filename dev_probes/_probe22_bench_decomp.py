"""Decompose bench.py's wall time: codec-only pipeline vs AE encode vs
AE decode vs the full bench loop, at the bench operating point (trained
model, natural content, B=64). Probe21 showed the codec pipeline alone at
63 MP/s while bench prints 38.7 — where do the extra ~250 ms/batch go?

Usage: python dev_probes/_probe22_bench_decomp.py [B] [n_iter]
"""
import os
import sys
import time

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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 4

ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
ae = ae_lib.get_network_cls(ae_config)(ae_config)
pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
codec = codec_lib.LatentCodec(pc, pc_config)

h, w = 512, 768
mp = B * h * w / 1e6
rng = np.random.RandomState(0)
x = jnp.asarray(bench.natural_images(rng, B, h, w))
params, batch_stats = bench.load_trained(bench.ASSET)
ae_vars = {'params': jax.device_put(params['ae']),
           'batch_stats': jax.device_put(batch_stats)}
pc_vars = {'params': jax.device_put(params['pc'])}
centers = np.asarray(jax.device_get(ae_vars['params']['encoder']['centers']))


@jax.jit
def ae_encode(ae_vars, x):
    return ae.apply(ae_vars, x, False, method='encode')


@jax.jit
def syms_chw(enc_symbols):
    return jnp.transpose(enc_symbols, (0, 3, 1, 2)).astype(jnp.int8)


@jax.jit
def q_from_syms(s):
    s_nhwc = jnp.transpose(s, (0, 2, 3, 1)).astype(jnp.int32)
    return jnp.asarray(centers)[s_nhwc]


@jax.jit
def ae_decode_syms(ae_vars, s):
    return ae.apply(ae_vars, q_from_syms(s), False, method='decode')


@jax.jit
def ae_encode_syms(ae_vars, x):
    return syms_chw(ae.apply(ae_vars, x, False, method='encode').symbols)


# warmup everything + roundtrip gate
enc = ae_encode(ae_vars, x)
syms_dev = syms_chw(enc.symbols)
res = codec.encode_batch(pc_vars, syms_dev, centers)
dec = codec.decode_batch(pc_vars, [r.bitstream for r in res], centers)
np.testing.assert_array_equal(dec, np.asarray(jax.device_get(syms_dev)))
res = codec.encode_batch(pc_vars, syms_dev, centers)
codec.decode_batch(pc_vars, [r.bitstream for r in res], centers)
jax.block_until_ready(ae_decode_syms(ae_vars, syms_dev))


def timed(name, fn, n=N_ITER):
    fn()  # extra warm
    t0 = time.time()
    for _ in range(n):
        fn()
    dt = (time.time() - t0) / n
    print(f'{name:34s} {dt * 1e3:8.1f} ms/batch  ({mp / dt:6.1f} MP/s-equiv)')
    return dt


# 1. AE encode, synced per iter (what bench.py adds to the pipeline time)
timed('ae_encode (sync each iter)',
      lambda: jax.block_until_ready(ae_encode(ae_vars, x).symbols))

# 2. AE encode, pipelined (dispatch all, block once)
def enc_pipe():
    outs = [ae_encode(ae_vars, x).symbols for _ in range(N_ITER)]
    jax.block_until_ready(outs)
t0 = time.time(); enc_pipe(); dt = (time.time() - t0) / N_ITER
print(f'{"ae_encode (pipelined)":34s} {dt * 1e3:8.1f} ms/batch  '
      f'({mp / dt:6.1f} MP/s-equiv)')

# 3. AE decode from symbols, synced per iter
timed('ae_decode_syms (sync each iter)',
      lambda: jax.block_until_ready(ae_decode_syms(ae_vars, syms_dev)))

# 4. codec pipeline alone (no AE legs in the loop)
def codec_only():
    dt = bench.run_pipeline(codec, pc_vars, x, centers, ae_vars,
                            lambda v, _x: syms_dev, lambda v, s: s, N_ITER)
    return dt
d = codec_only()
print(f'{"codec pipeline (no AE legs)":34s} {d * 1e3:8.1f} ms/batch  '
      f'({mp / d:6.1f} MP/s-equiv)')

# 5. the full end-to-end pipeline (bench's run_pipeline)
d = bench.run_pipeline(codec, pc_vars, x, centers, ae_vars,
                       ae_encode_syms, ae_decode_syms, N_ITER)
print(f'{"full pipeline (AE enc+codec+AE dec)":34s} {d * 1e3:8.1f} ms/batch  '
      f'({mp / d:6.1f} MP/s-equiv)')
