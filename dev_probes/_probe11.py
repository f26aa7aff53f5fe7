import time
import numpy as np
import jax
import jax.numpy as jnp
from imgcomp_cvpr_tpu.coding import pallas_codec as pcodec
from imgcomp_cvpr_tpu.coding import pallas_kernel as pk
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib

SHAPE = (32, 64, 96)
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
pc = pc_lib.ProbClassifier(pc_config, 6)
coder = pcodec.PallasCoder(pc, pc_config)
tables, sched = coder._tables(SHAPE)
pt = coder._prep_fns(SHAPE, 1)[0](jnp.zeros((1, 32 * 64 * 96), jnp.int8))
z = jnp.zeros(pt.shape, jnp.int32)
print('pt format:   ', pt.format)
print('zeros format:', z.format)
print('table format:', tables[0].format)
pt2 = jax.device_put(np.asarray(pt))
print('roundtrip fmt:', pt2.format)
