"""Per-stage host-side timing of the production codec pipeline at bench
shapes: where does the wall-clock go between device-only throughput and
the pipelined bench number? Times each host call (submit/finish/parse/
serialize/fetch) across iterations of the depth-2 pipeline.

Usage: python dev_probes/_probe21_stages.py [B] [n_iter]
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
from imgcomp_cvpr_tpu.coding import codec as codec_lib
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SHAPE = (32, 64, 96)
L = 6

pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
pc = pc_lib.ProbClassifier(pc_config, L)
rng = np.random.RandomState(0)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers = np.linspace(-2, 2, L).astype(np.float32)
syms = rng.randint(0, L, size=(B,) + SHAPE).astype(np.int8)
syms_dev = jax.device_put(jnp.asarray(syms))
codec = codec_lib.LatentCodec(pc, pc_config, impl='pallas')

acc = {}


def t(name, fn, *a, **kw):
    t0 = time.time()
    out = fn(*a, **kw)
    dt = time.time() - t0
    acc.setdefault(name, []).append(dt)
    return out


# warmup/compile + roundtrip gate
res = codec.encode_batch(pc_params, syms_dev, centers)
dec = codec.decode_batch(pc_params, [r.bitstream for r in res], centers)
np.testing.assert_array_equal(dec, syms.astype(np.int32))
# second cycle compiles predicted-rneed fused encode
res = codec.encode_batch(pc_params, syms_dev, centers)
codec.decode_batch(pc_params, [r.bitstream for r in res], centers)

# depth-2 pipelined loop with per-stage timing
t0_all = time.time()
enc_h = t('enc_submit', codec.encode_batch_submit, pc_params, syms_dev,
          centers)
dec_h = None
for i in range(N_ITER):
    enc_next = (t('enc_submit', codec.encode_batch_submit, pc_params,
                  syms_dev, centers) if i + 1 < N_ITER else None)
    rs = t('enc_finish', codec.encode_batch_finish, enc_h)
    enc_h = enc_next
    dec_prev, dec_h = dec_h, t('dec_submit', codec.decode_batch_submit,
                               pc_params, [r.bitstream for r in rs], centers)
    if dec_prev is not None:
        t('dec_finish', codec.decode_batch_finish, dec_prev, device_out=True)
out = t('dec_finish', codec.decode_batch_finish, dec_h, device_out=True)
jax.block_until_ready(out)
wall = time.time() - t0_all

mp = B * 512 * 768 / 1e6
print(f'B={B} n_iter={N_ITER} wall/iter={wall / N_ITER * 1e3:.1f} ms '
      f'=> {mp / (wall / N_ITER):.1f} MP/s')
for name, ts in acc.items():
    ts = ts[1:] if len(ts) > 1 else ts   # drop first (may hide compile)
    print(f'  {name:12s} mean {np.mean(ts) * 1e3:7.1f} ms  '
          f'min {np.min(ts) * 1e3:7.1f}  max {np.max(ts) * 1e3:7.1f}')
