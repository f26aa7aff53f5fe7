"""Round-3 probe: planar K=5 codec at Kodak scale on the real chip —
Mosaic compile check, bit-exact roundtrip, throughput.

Usage: python dev_probes/_probe18_planar_k5.py [B] [BSUB] [K]
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

from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib
from imgcomp_cvpr_tpu.coding import codec as codec_lib

SHAPE = (32, 64, 96)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
BSUB = int(sys.argv[2]) if len(sys.argv) > 2 else 2
K = int(sys.argv[3]) if len(sys.argv) > 3 else 5
os.environ['IMGCOMP_PLANAR_BSUB'] = str(BSUB)

pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
pc_config = pc_config.replace(kernel_size=K)
L = 6
pc = pc_lib.ProbClassifier(pc_config, L)
rng = np.random.RandomState(0)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers = np.linspace(-2, 2, L).astype(np.float32)
syms = rng.randint(0, L, size=(B,) + SHAPE).astype(np.int8)

codec = codec_lib.LatentCodec(pc, pc_config, impl='planar')
mp = B * SHAPE[1] * SHAPE[2] * 64 / 1e6

t0 = time.time()
enc = codec.encode_batch(pc_params, syms, centers)
print(f'first encode (incl compile): {time.time()-t0:.1f}s, '
      f'bytes={[len(r.bitstream) for r in enc]}', flush=True)
t0 = time.time()
dec = codec.decode_batch(pc_params, [r.bitstream for r in enc], centers)
print(f'first decode (incl compile): {time.time()-t0:.1f}s', flush=True)
np.testing.assert_array_equal(dec, syms.astype(np.int32))
print(f'K={K} PLANAR ROUNDTRIP BIT-EXACT ON TPU', flush=True)

n = 4
enc_ts, dec_ts = [], []
for _ in range(n):
    # per-iteration times: the FIRST loop encode compiles the predicted-
    # rneed fused executable (the presel fast path) — best-of is the
    # warm number, mirroring bench.py's loop policy
    t0 = time.time()
    enc = codec.encode_batch(pc_params, syms, centers)
    enc_ts.append(time.time() - t0)
for _ in range(n):
    t0 = time.time()
    codec.decode_batch(pc_params, [r.bitstream for r in enc], centers,
                       device_out=True)
    dec_ts.append(time.time() - t0)
print('enc iters', [f'{t:.2f}' for t in enc_ts],
      'dec iters', [f'{t:.2f}' for t in dec_ts], flush=True)
enc_t, dec_t = min(enc_ts), min(dec_ts)
tot = enc_t + dec_t
print(f'enc {enc_t*1e3:.0f} ms ({enc_t/B*1e3:.0f} ms/img), '
      f'dec {dec_t*1e3:.0f} ms ({dec_t/B*1e3:.0f} ms/img), '
      f'enc+dec throughput {mp/tot:.3f} MP/s', flush=True)
