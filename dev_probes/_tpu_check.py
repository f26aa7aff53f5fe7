"""TPU compile + correctness + timing for the pallas codec at Kodak scale."""
import os
import sys
import time
import numpy as np
import jax

os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
from imgcomp_cvpr_tpu.coding import codec as codec_lib
from imgcomp_cvpr_tpu.coding import pallas_kernel as pk
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
SHAPE = (32, 64, 96)   # Kodak latent (cvpr/low: C=32, 512x768 image / 8)

pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
L = 6
pc = pc_lib.ProbClassifier(pc_config, L)
print('backend:', jax.default_backend(), 'B =', B)

rng = np.random.RandomState(0)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers = np.linspace(-2, 2, L).astype(np.float32)
syms = rng.randint(0, L, size=(B,) + SHAPE).astype(np.int8)

sched = pk.build_pallas_schedule(SHAPE)
ring_mb = sum(pk.VR * ln * c * 4 / 1e6 for ln, c in
              zip(sched.lanes, (pk.Q_CH, 24, 24, 24)))
print(f'sched: T={sched.T} P={sched.P} P_pad={sched.P_pad} S={sched.S}')
print(f'DW={sched.DW} J={sched.J} J_STORE={sched.J_STORE} lanes={sched.lanes} rings={ring_mb:.1f}MB')

codec = codec_lib.LatentCodec(pc, pc_config, impl='pallas')

t0 = time.time()
res = codec.encode_batch(pc_params, syms, centers)
print(f'encode (compile+run): {time.time() - t0:.1f}s')
t0 = time.time()
dec = codec.decode_batch(pc_params, [r.bitstream for r in res], centers)
print(f'decode (compile+run): {time.time() - t0:.1f}s')
np.testing.assert_array_equal(dec, syms.astype(np.int32))
print('roundtrip bit-exact OK')
for i in range(min(B, 2)):
    real = len(res[i].bitstream) * 8
    print(f'img {i}: real={real} theo={res[i].theoretical_bits:.0f} '
          f'overhead={(real / res[i].theoretical_bits - 1) * 100:.3f}%')

# timing (cached executables)
n = 3
t0 = time.time()
for _ in range(n):
    res = codec.encode_batch(pc_params, syms, centers)
enc_dt = (time.time() - t0) / n
t0 = time.time()
for _ in range(n):
    dec = codec.decode_batch(pc_params, [r.bitstream for r in res], centers)
dec_dt = (time.time() - t0) / n
mp = B * 512 * 768 / 1e6
print(f'encode: {enc_dt * 1e3:.1f} ms ({mp / enc_dt:.2f} MP/s)')
print(f'decode: {dec_dt * 1e3:.1f} ms ({mp / dec_dt:.2f} MP/s)')
print(f'enc+dec: {mp / (enc_dt + dec_dt):.2f} MP/s')
