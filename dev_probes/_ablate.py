"""Ablation timing of the pallas codec at Kodak scale, via the production
encode/decode jits (bare-kernel jits crash the TPU runtime; the production
fold/pack+kernel fused jits are the supported path). The reverse-rANS
kernel is identical across variants, so deltas attribute forward-scan cost.

Usage: python _ablate.py [full norans noconv notaps nodot empty] [B]
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
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
variants = (sys.argv[1] or 'full,norans,noconv').split(',') \
    if len(sys.argv) > 1 else ['full', 'norans', 'noconv']
BSUB = int(sys.argv[4]) if len(sys.argv) > 4 else 1
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
    # Pipelined: block once at the end — the axon tunnel's per-call sync
    # round-trip is ~35 ms and must not be counted per call.
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.time() - t0) / n


rev_variants = sys.argv[3].split(',') if len(sys.argv) > 3 else ['full']

for ablate in variants:
  for rev_ablate in rev_variants:
    pk.make_forward.cache_clear()
    pk.make_reverse.cache_clear()
    pk._ABLATE = ablate
    pk._ABLATE_REV = rev_ablate
    label = ablate if rev_ablate == 'full' else f'{ablate}/rev-{rev_ablate}'
    coder = pcodec.PallasCoder(pc, pc_config)
    ks = coder._kernels(SHAPE, B, RING16)
    encode_dev, decode_dev, sched = ks.encode_dev, ks.decode_dev, ks.sched
    dt = timeit(encode_dev, pc_params, centers_j, syms_flat)
    us = dt / (sched.T * B) * 1e6
    print(f'{label}: enc {dt * 1e3:.1f} ms ({us:.1f} us/step/img)',
          flush=True)
    if ablate == 'full':
        # decode timing (fwd only, no reverse kernel): junk streams are fine
        # below the CRC layer.
        wrows = sched.wcap // 128 + 2
        words = jnp.zeros((B, 4096), jnp.uint32)
        states = jnp.full((B, 1, pk.R), rans.RANS_L, jnp.uint32)
        dt = timeit(lambda: decode_dev(pc_params, centers_j, words, states,
                                       nbucket=4096))
        us = dt / (sched.T * B) * 1e6
        print(f'{ablate}: dec {dt * 1e3:.1f} ms ({us:.1f} us/step/img)',
              flush=True)
