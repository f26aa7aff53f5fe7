"""Probe: actual VMEM capacity on this chip (scratch alloc bisect)."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_mb(mb):
    rows = int(mb * 1024 * 1024 / 4 / 1024)
    def kernel(x_ref, o_ref, big):
        big[0, :] = x_ref[0, :] * 2.0
        o_ref[0, :] = big[0, :]
    call = pl.pallas_call(
        kernel, grid=(1,),
        in_specs=[pl.BlockSpec((8, 1024), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, 1024), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, 1024), jnp.float32)])
    x = jnp.ones((8, 1024), jnp.float32)
    try:
        out = jax.jit(call)(x)
        jax.block_until_ready(out)
        return True
    except Exception as e:
        print(f'{mb} MB: FAIL ({str(e)[:120]})', flush=True)
        return False

for mb in [16, 20, 24, 28, 32, 48, 64, 96, 120]:
    ok = try_mb(mb)
    print(f'{mb} MB scratch: {"OK" if ok else "fail"}', flush=True)
    if not ok:
        break
