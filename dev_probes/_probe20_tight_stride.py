"""Round-3 probe: tight-stride rings — roundtrip + timing at bsub 2/4."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib
from imgcomp_cvpr_tpu.coding import codec as codec_lib
from imgcomp_cvpr_tpu.coding import pallas_kernel as pk
from imgcomp_cvpr_tpu.coding import rans

SHAPE = (32, 64, 96)
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
pc = pc_lib.ProbClassifier(pc_config, 6)
rng = np.random.RandomState(0)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers = np.linspace(-2, 2, 6).astype(np.float32)
centers_j = jnp.asarray(centers)

def timeit(fn, *a, n=8):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*a) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.time()-t0)/n

for BSUB, B in [(2, 2), (4, 4)]:
    os.environ['IMGCOMP_PALLAS_BSUB'] = str(BSUB)
    pk.make_forward.cache_clear(); pk.make_reverse.cache_clear()
    syms = rng.randint(0, 6, size=(B,) + SHAPE).astype(np.int8)
    codec = codec_lib.LatentCodec(pc, pc_config, impl='pallas')
    t0 = time.time()
    enc = codec.encode_batch(pc_params, syms, centers)
    print(f'bsub={BSUB}: first encode {time.time()-t0:.0f}s '
          f'bytes={[len(r.bitstream) for r in enc]}', flush=True)
    dec = codec.decode_batch(pc_params, [r.bitstream for r in enc], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))
    print(f'bsub={BSUB}: ROUNDTRIP BIT-EXACT', flush=True)
    coder = codec._pallas_coder()
    ks = coder._kernels(SHAPE, B, True)
    syms_flat = jnp.asarray(syms.reshape(B, -1))
    dt = timeit(ks.encode_dev, pc_params, centers_j, syms_flat)
    print(f'bsub={BSUB}: enc {dt*1e3:.1f} ms ({dt/(1186*B)*1e6:.2f} us/step/img)',
          flush=True)
    words = jnp.zeros((B, 4096), jnp.uint32)
    states = jnp.full((B, 1, pk.R), rans.RANS_L, jnp.uint32)
    dt = timeit(lambda: ks.decode_dev(pc_params, centers_j, words, states,
                                      nbucket=4096))
    print(f'bsub={BSUB}: dec {dt*1e3:.1f} ms ({dt/(1186*B)*1e6:.2f} us/step/img)',
          flush=True)
