"""Round-3 probe: VPU lane-routing rANS (IMGCOMP_PALLAS_RANS=vpu) vs the
round-2 one-hot-matmul routing — stream byte-equality, roundtrip, timing.

Usage: python dev_probes/_probe16_vpu_rans.py [B] [BSUB]
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
from imgcomp_cvpr_tpu.coding import pallas_kernel as pk
from imgcomp_cvpr_tpu.coding import pallas_codec as pcodec
from imgcomp_cvpr_tpu.coding import rans
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib

SHAPE = (32, 64, 96)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
BSUB = int(sys.argv[2]) if len(sys.argv) > 2 else 2
os.environ['IMGCOMP_PALLAS_BSUB'] = str(BSUB)
RING16 = BSUB > 1

pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
L = 6
pc = pc_lib.ProbClassifier(pc_config, L)
rng = np.random.RandomState(0)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers = np.linspace(-2, 2, L).astype(np.float32)
syms = rng.randint(0, L, size=(B,) + SHAPE).astype(np.int8)
syms_flat = jnp.asarray(syms.reshape(B, -1))
centers_j = jnp.asarray(centers)


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.time() - t0) / n


results = {}
for impl in ['matmul', 'vpu']:
    pk.make_forward.cache_clear()
    pk.make_reverse.cache_clear()
    os.environ['IMGCOMP_PALLAS_RANS'] = impl
    coder = pcodec.PallasCoder(pc, pc_config)
    enc = coder.encode_batch(pc_params, syms, centers)
    dec = coder.decode_batch(pc_params, [r.bitstream for r in enc], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))
    print(f'{impl}: roundtrip bit-exact; stream bytes '
          f'{[len(r.bitstream) for r in enc]}', flush=True)
    results[impl] = [r.bitstream for r in enc]

    ks = coder._kernels(SHAPE, B, RING16)
    sched = ks.sched
    dt = timeit(ks.encode_dev, pc_params, centers_j, syms_flat)
    print(f'{impl}: enc(fwd_par+rev) {dt*1e3:.1f} ms '
          f'({dt/(sched.T*B)*1e6:.1f} us/step/img)', flush=True)
    words = jnp.zeros((B, 4096), jnp.uint32)
    states = jnp.full((B, 1, pk.R), rans.RANS_L, jnp.uint32)
    dt = timeit(lambda: ks.decode_dev(pc_params, centers_j, words, states,
                                      nbucket=4096))
    print(f'{impl}: dec(fwd) {dt*1e3:.1f} ms '
          f'({dt/(sched.T*B)*1e6:.1f} us/step/img)', flush=True)

assert results['matmul'] == results['vpu'], 'streams differ between impls!'
print('STREAMS BYTE-IDENTICAL between matmul and vpu routing')

# cross-decode: vpu-encoded stream through matmul kernels
pk.make_forward.cache_clear()
pk.make_reverse.cache_clear()
os.environ['IMGCOMP_PALLAS_RANS'] = 'matmul'
coder = pcodec.PallasCoder(pc, pc_config)
dec = coder.decode_batch(pc_params, results['vpu'], centers)
np.testing.assert_array_equal(dec, syms.astype(np.int32))
print('cross-impl decode ok')
