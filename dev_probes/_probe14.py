"""Layout-poison test: fwd kernel with inputs created INSIDE the jit
(no pack gathers / host transfers) vs the production encode path."""
import os, sys, time
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
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers_j = jnp.asarray(np.linspace(-2, 2, L).astype(np.float32))
coder = pcodec.PallasCoder(pc, pc_config)
tables, sched = coder._tables(SHAPE)
wrows = sched.wcap // 128 + 2
T = sched.T

pk._ABLATE = sys.argv[1] if len(sys.argv) > 1 else 'full'
fwd, _ = pk.make_forward(SHAPE, pc_config.arch_param__k, L, 1)

@jax.jit
def f_inside(pc_params, centers):
    w = pcodec._fold_weights(pc, pc_config, pc_config.arch_param__k, L,
                             pc_params, centers)
    true_s = jnp.zeros((1, sched.idx_map.shape[0], 1, sched.P_pad), jnp.int32)
    streams = jnp.zeros((1, wrows, 128), jnp.uint32)
    states = jnp.full((1, 1, pk.R), rans.RANS_L, jnp.uint32)
    return fwd(w, tables, true_s, streams, states, jnp.ones((1,), jnp.int32))

def timeit(fn, *args, n=8):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.time() - t0) / n

dt = timeit(f_inside, pc_params, centers_j)
print(f'inside-jit zeros ({pk._ABLATE}): {dt*1e3:.1f} ms ({dt/T*1e6:.2f} us/step)', flush=True)
