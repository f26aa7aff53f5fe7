"""Isolate the pallas grid-pipeline floor: stream blocks like the codec
kernel does, empty body variants."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, K, P, NS, B = 1186, 8, 768, 91, 1
TB = -(-T // K)
T_pad = TB * K


def timeit(f, *a, n=5):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*a); jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    return dt


def build(sem, n_out, with_inputs, smem_table):
    def kernel(*refs):
        i = 0
        tbl = refs[0]; i = 1
        ins = refs[i:i + (2 if with_inputs else 0)]
        i += (2 if with_inputs else 0)
        outs = refs[i:i + n_out]
        z = tbl[0, 0, 0]
        for r in ins:
            z = z + r[0, 0, 0]
        for o in outs:
            o[0, 0, :, 0:128] = jnp.zeros((1, 128), jnp.int32) + z

    in_specs = [pl.BlockSpec((K, 1, NS), lambda b, t: (t, 0, 0),
                             memory_space=(pltpu.SMEM if smem_table
                                           else pltpu.VMEM))]
    args = [jnp.zeros((T_pad, 1, NS), jnp.int32)]
    if with_inputs:
        for _ in range(2):
            in_specs.append(pl.BlockSpec((K, 1, P), lambda b, t: (t, 0, 0)))
            args.append(jnp.zeros((T_pad, 1, P), jnp.int32))
    out_specs = tuple(pl.BlockSpec((1, K, 1, P), lambda b, t: (b, t, 0, 0))
                      for _ in range(n_out))
    out_shape = tuple(jax.ShapeDtypeStruct((B, T_pad, 1, P), jnp.int32)
                      for _ in range(n_out))
    params = {}
    if sem is not None:
        params['compiler_params'] = pltpu.CompilerParams(
            dimension_semantics=sem)
    call = pl.pallas_call(kernel, grid=(B, TB), in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape, **params)
    return jax.jit(lambda *a: call(*a)), args


for name, sem, n_out, with_inputs, smem in [
    ('arb, 3out, 2in, smem-tbl', ('arbitrary', 'arbitrary'), 3, True, True),
    ('default-sem, 3out, 2in, smem', None, 3, True, True),
    ('arb, 3out, 2in, vmem-tbl', ('arbitrary', 'arbitrary'), 3, True, False),
    ('arb, 1out, 2in, smem', ('arbitrary', 'arbitrary'), 1, True, True),
    ('arb, 3out, 0in, smem', ('arbitrary', 'arbitrary'), 3, False, True),
    ('arb, 1out, 0in, vmem', ('arbitrary', 'arbitrary'), 1, False, False),
]:
    try:
        f, args = build(sem, n_out, with_inputs, smem)
        dt = timeit(f, *args)
        print(f'{name}: {dt * 1e3:.1f} ms ({dt / T * 1e6:.2f} us/step)')
    except Exception as e:
        print(f'{name}: {type(e).__name__} ' + str(e).replace(chr(10), ' ')[:120])
