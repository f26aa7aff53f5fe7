"""Round-3 probe: decode-path cost decomposition at the production config
(bsub=2 bf16 rings). Times the DECODE jit under forward-kernel ablations.

Usage: python dev_probes/_probe17_dec_ablate.py [B] [BSUB] [variants]
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
variants = (sys.argv[3].split(',') if len(sys.argv) > 3
            else ['full', 'norans', 'nocdf', 'notaps', 'nodot', 'noqwrite'])
os.environ['IMGCOMP_PALLAS_BSUB'] = str(BSUB)
RING16 = BSUB > 1

pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
L = 6
pc = pc_lib.ProbClassifier(pc_config, L)
rng = np.random.RandomState(0)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers_j = jnp.asarray(np.linspace(-2, 2, L).astype(np.float32))

sched = pk.build_pallas_schedule(SHAPE)
print(f'schedule: T={sched.T} S={sched.S} P_pad={sched.P_pad} '
      f'J_STORE={sched.J_STORE} DW={sched.DW} lanes={sched.lanes} '
      f'chunks/step active avg='
      f'{sched.table[:sched.T, 0, pk._TBL_SUBIT:].sum() / sched.T:.2f}')


def timeit(fn, n=8):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.time() - t0) / n


for ablate in variants:
    pk.make_forward.cache_clear()
    pk.make_reverse.cache_clear()
    pk._ABLATE = ablate
    coder = pcodec.PallasCoder(pc, pc_config)
    ks = coder._kernels(SHAPE, B, RING16)
    words = jnp.zeros((B, 4096), jnp.uint32)
    states = jnp.full((B, 1, pk.R), rans.RANS_L, jnp.uint32)
    dt = timeit(lambda: ks.decode_dev(pc_params, centers_j, words, states,
                                      nbucket=4096))
    print(f'dec {ablate}: {dt*1e3:.1f} ms ({dt/(sched.T*B)*1e6:.2f} '
          f'us/step/img)', flush=True)
pk._ABLATE = 'full'
