"""Ablation timing of the pallas forward kernel at Kodak scale."""
import os
import sys
import time
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
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
L = 6
pc = pc_lib.ProbClassifier(pc_config, L)
rng = np.random.RandomState(0)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers = np.linspace(-2, 2, L).astype(np.float32)
syms = rng.randint(0, L, size=(1,) + SHAPE).astype(np.int8)

coder = pcodec.PallasCoder(pc, pc_config)
tables, sched = coder._tables(SHAPE)
pack_true = coder._prep_fns(SHAPE, 1)[0]
weights = coder._weights(pc_params, centers)
true_syms = pack_true(jnp.asarray(syms.reshape(1, -1)))
wrows = sched.wcap // 128 + 2
streams_dummy = jnp.zeros((1, wrows, 128), jnp.uint32)
states_dummy = jnp.full((1, 1, pk.R), rans.RANS_L, jnp.uint32)
mode1 = jnp.ones((1,), jnp.int32)

def timeit(fn, *args, n=8):
    # Pipelined: block once at the end — the axon tunnel's per-call sync
    # round-trip is ~35 ms and must not be counted per call.
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.time() - t0) / n

for ablate in (sys.argv[1:] or ['full', 'norans', 'noconv']):
    pk.make_forward.cache_clear()
    pk._ABLATE = ablate
    fwd, _ = pk.make_forward(SHAPE, pc_config.arch_param__k, L, 1)
    f = jax.jit(fwd)
    dt = timeit(f, weights, tables, true_syms, streams_dummy, states_dummy,
                mode1)
    print(f'{ablate}: {dt * 1e3:.1f} ms ({dt / sched.T * 1e6:.1f} us/step)')
