"""Quality + throughput of the bf16 AE compute dtype on the trained model
(natural content): PSNR-vs-original for f32/bf16 decoders, symbol match,
theoretical-bits shift, and B=64 timing of both dtypes.

Usage: python dev_probes/_probe24_ae_bf16.py [B_time] [B_qual]
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

B_time = int(sys.argv[1]) if len(sys.argv) > 1 else 64
B_qual = int(sys.argv[2]) if len(sys.argv) > 2 else 8

ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
ae32 = ae_lib.get_network_cls(ae_config)(ae_config)
ae16 = ae_lib.get_network_cls(ae_config)(ae_config, dtype=jnp.bfloat16)
pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
codec = codec_lib.LatentCodec(pc, pc_config)

h, w = 512, 768
rng = np.random.RandomState(0)
params, batch_stats = bench.load_trained(bench.ASSET)
ae_vars = {'params': jax.device_put(params['ae']),
           'batch_stats': jax.device_put(batch_stats)}
pc_vars = {'params': jax.device_put(params['pc'])}
centers = np.asarray(jax.device_get(ae_vars['params']['encoder']['centers']))


def enc_fn(ae):
    @jax.jit
    def f(v, x):
        e = ae.apply(v, x, False, method='encode')
        return e.symbols, e.qhard
    return f


def dec_fn(ae):
    @jax.jit
    def f(v, q):
        return ae.apply(v, q, False, method='decode')
    return f


enc32, enc16 = enc_fn(ae32), enc_fn(ae16)
dec32, dec16 = dec_fn(ae32), dec_fn(ae16)

# ---- quality at B_qual --------------------------------------------------
xq = jnp.asarray(bench.natural_images(rng, B_qual, h, w))
s32, q32 = enc32(ae_vars, xq)
s16, q16 = enc16(ae_vars, xq)
r32 = dec32(ae_vars, q32)
r16 = dec16(ae_vars, q16)   # full bf16 chain: bf16 enc symbols + bf16 dec
r16_dec_only = dec16(ae_vars, q32)
out = jax.device_get((s32, s16, r32, r16, r16_dec_only))
s32h, s16h, r32h, r16h, r16dh = out


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


xqh = np.asarray(jax.device_get(xq))
print(f'sym match bf16-vs-f32: {np.mean(s32h == s16h) * 100:.4f}%')
print(f'PSNR recon-vs-orig  f32: {psnr(r32h, xqh):.4f} dB')
print(f'PSNR recon-vs-orig bf16: {psnr(r16h, xqh):.4f} dB')
print(f'PSNR recon-vs-orig bf16dec/f32enc: {psnr(r16dh, xqh):.4f} dB')
print(f'PSNR bf16dec-vs-f32dec (same syms): {psnr(r16dh, r32h):.2f} dB')

# theoretical bits of both symbol sets
def chw(s):
    return jnp.transpose(s, (0, 3, 1, 2)).astype(jnp.int8)

res32 = codec.encode_batch(pc_vars, chw(jnp.asarray(s32h)), centers)
res16 = codec.encode_batch(pc_vars, chw(jnp.asarray(s16h)), centers)
t32 = sum(r.theoretical_bits for r in res32)
t16 = sum(r.theoretical_bits for r in res16)
print(f'theoretical bits: f32 {t32:.0f}  bf16 {t16:.0f}  '
      f'delta {100 * (t16 / t32 - 1):+.4f}%')

# ---- timing at B_time ---------------------------------------------------
@jax.jit
def _checksum(x):
    return jnp.sum(x.astype(jnp.float32))


def timed(name, f, *args, n=4):
    o = f(*args)
    jax.device_get(_checksum(o if isinstance(o, jax.Array) else o[0]))
    t0 = time.time()
    for _ in range(n):
        o = f(*args)
    jax.device_get(_checksum(o if isinstance(o, jax.Array) else o[0]))
    dt = (time.time() - t0) / n
    mp = B_time * h * w / 1e6
    print(f'{name:28s} {dt * 1e3:8.1f} ms/batch ({mp / dt:6.1f} MP/s-equiv)')


xt = jnp.asarray(bench.natural_images(rng, B_time, h, w))
_, qt = enc32(ae_vars, xt)
timed('enc f32', lambda: enc32(ae_vars, xt))
timed('enc bf16', lambda: enc16(ae_vars, xt))
timed('dec f32', lambda: dec32(ae_vars, qt))
timed('dec bf16', lambda: dec16(ae_vars, qt))
