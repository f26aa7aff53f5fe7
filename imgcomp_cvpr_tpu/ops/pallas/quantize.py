"""Fused Pallas TPU kernel for soft-to-hard quantization.

One VMEM pass computes, per element: distances to the L centers, the
softmax soft assignment, qsoft = E[centers], the nearest center (qhard,
symbols) and the straight-through output qbar = qsoft + sg(qhard - qsoft)
— the op BASELINE.json designates for kernel fusion (the XLA fallback in
models/quantizer.py materializes the (.., L) distance/softmax tensors in
HBM; here everything stays in registers/VMEM).

The backward pass (d qbar/d x = d qsoft/d x, plus d centers) is a second
fused kernel via jax.custom_vjp.

Layout: x is flattened to (rows, 128) lanes; L is tiny (6) so the
per-center loop is unrolled in-register. Tail elements are handled by
padding to the tile size (quantize() restores the original shape).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 64  # rows of 128 lanes per grid step


def _interpret() -> bool:
    # Pallas compiles only for TPU; fall back to interpreter on CPU (tests).
    return jax.default_backend() == 'cpu'


class PallasQuantizerOutput(NamedTuple):
    qbar: jax.Array
    qsoft: jax.Array
    qhard: jax.Array
    symbols: jax.Array


def _fwd_kernel(x_ref, centers_ref, qsoft_ref, qhard_ref, sym_ref,
                *, num_centers: int, sigma: float):
    x = x_ref[:]
    # distances and streaming softmax over the (tiny) center axis
    best_dist = jnp.full_like(x, jnp.inf)
    best_idx = jnp.zeros(x.shape, jnp.int32)
    max_neg = jnp.full_like(x, -jnp.inf)
    for l in range(num_centers):
        d = jnp.square(x - centers_ref[0, l])
        take = d < best_dist                      # strict: first min wins
        best_dist = jnp.where(take, d, best_dist)
        best_idx = jnp.where(take, l, best_idx)
        max_neg = jnp.maximum(max_neg, -sigma * d)
    denom = jnp.zeros_like(x)
    numer = jnp.zeros_like(x)
    hard = jnp.zeros_like(x)
    for l in range(num_centers):
        c = centers_ref[0, l]
        e = jnp.exp(-sigma * jnp.square(x - c) - max_neg)
        denom = denom + e
        numer = numer + e * c
        hard = jnp.where(best_idx == l, c, hard)
    qsoft_ref[:] = numer / denom
    qhard_ref[:] = hard
    sym_ref[:] = best_idx


def _bwd_kernel(x_ref, centers_ref, g_ref, gh_ref, dx_ref, dc_ref,
                *, num_centers: int, sigma: float):
    """VJP w.r.t. x and centers.

    Soft path (qsoft = sum_l p_l c_l, p = softmax(-sigma (x - c)^2)):
      d qsoft/dx   = sum_l p_l * (-2 sigma (x - c_l)) (c_l - qsoft)
      d qsoft/dc_l = p_l (1 + 2 sigma (x - c_l)(c_l - qsoft))
    Hard path (qhard = centers[argmin]): d qhard/dc_l = [argmin == l].
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        dc_ref[:] = jnp.zeros_like(dc_ref)

    x = x_ref[:]
    g = g_ref[:]
    gh = gh_ref[:]
    max_neg = jnp.full_like(x, -jnp.inf)
    best_dist = jnp.full_like(x, jnp.inf)
    best_idx = jnp.zeros(x.shape, jnp.int32)
    for l in range(num_centers):
        d = jnp.square(x - centers_ref[0, l])
        take = d < best_dist
        best_dist = jnp.where(take, d, best_dist)
        best_idx = jnp.where(take, l, best_idx)
        max_neg = jnp.maximum(max_neg, -sigma * d)
    denom = jnp.zeros_like(x)
    numer = jnp.zeros_like(x)
    for l in range(num_centers):
        e = jnp.exp(-sigma * jnp.square(x - centers_ref[0, l]) - max_neg)
        denom = denom + e
        numer = numer + e * centers_ref[0, l]
    qsoft = numer / denom
    dx = jnp.zeros_like(x)
    # Mosaic cannot store scalars to VMEM; the per-center sums are placed
    # into a (1, L) row via an iota mask and accumulated with one row store.
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, dc_ref.shape[1]), 1)
    dc_row = jnp.zeros((1, dc_ref.shape[1]), jnp.float32)
    for l in range(num_centers):
        c = centers_ref[0, l]
        p = jnp.exp(-sigma * jnp.square(x - c) - max_neg) / denom
        diff = x - c
        dx = dx + p * (-2.0 * sigma * diff) * (c - qsoft)
        dc = p * (1.0 + 2.0 * sigma * diff * (c - qsoft))
        hard_sel = (best_idx == l).astype(jnp.float32)
        dc_row = dc_row + jnp.where(cidx == l,
                                    jnp.sum(g * dc + gh * hard_sel), 0.0)
    dc_ref[:] = dc_ref[:] + dc_row
    dx_ref[:] = g * dx


def _pad_rows(flat: jax.Array) -> jax.Array:
    n = flat.shape[0]
    per_block = _BLOCK_ROWS * _LANES
    padded = -(-n // per_block) * per_block
    return jnp.pad(flat, (0, padded - n))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def quantize_pallas(x: jax.Array, centers: jax.Array, sigma: float = 1.0):
    qsoft, qhard, symbols = _forward(x, centers, sigma)
    qbar = qsoft + jax.lax.stop_gradient(qhard - qsoft)
    return PallasQuantizerOutput(qbar, qsoft, qhard, symbols)


def _forward(x: jax.Array, centers: jax.Array, sigma: float):
    orig_shape = x.shape
    num_centers = centers.shape[0]
    flat = _pad_rows(x.reshape(-1))
    rows = flat.shape[0] // _LANES
    x2d = flat.reshape(rows, _LANES)
    c2d = jnp.broadcast_to(centers[None, :], (1, num_centers))

    grid = (rows // _BLOCK_ROWS,)
    blk = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    qsoft, qhard, sym = pl.pallas_call(
        functools.partial(_fwd_kernel, num_centers=num_centers, sigma=sigma),
        grid=grid,
        in_specs=[blk, pl.BlockSpec((1, num_centers), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
        out_specs=(blk, blk, blk),
        out_shape=(jax.ShapeDtypeStruct(x2d.shape, jnp.float32),
                   jax.ShapeDtypeStruct(x2d.shape, jnp.float32),
                   jax.ShapeDtypeStruct(x2d.shape, jnp.int32)),
        interpret=_interpret(),
    )(x2d, c2d)

    n = int(np.prod(orig_shape))
    return (qsoft.reshape(-1)[:n].reshape(orig_shape),
            qhard.reshape(-1)[:n].reshape(orig_shape),
            sym.reshape(-1)[:n].reshape(orig_shape))


def _vjp_fwd(x, centers, sigma):
    out = quantize_pallas(x, centers, sigma)
    return out, (x, centers)


def _vjp_bwd(sigma, residuals, g: PallasQuantizerOutput):
    x, centers = residuals
    # straight-through: cotangents of qbar and qsoft both flow through qsoft;
    # qhard's cotangent flows to centers only (gather).
    g_eff = g.qbar + g.qsoft
    g_hard = g.qhard
    num_centers = centers.shape[0]
    orig_shape = x.shape
    n = int(np.prod(orig_shape))
    flat_x = _pad_rows(x.reshape(-1))
    flat_g = _pad_rows(g_eff.reshape(-1))
    flat_gh = _pad_rows(g_hard.reshape(-1))
    rows = flat_x.shape[0] // _LANES
    x2d = flat_x.reshape(rows, _LANES)
    g2d = flat_g.reshape(rows, _LANES)
    gh2d = flat_gh.reshape(rows, _LANES)
    c2d = jnp.broadcast_to(centers[None, :], (1, num_centers))

    grid = (rows // _BLOCK_ROWS,)
    blk = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, num_centers), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    dx, dc = pl.pallas_call(
        functools.partial(_bwd_kernel, num_centers=num_centers, sigma=sigma),
        grid=grid,
        in_specs=[blk, cspec, blk, blk],
        out_specs=(blk, cspec),
        out_shape=(jax.ShapeDtypeStruct(x2d.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, num_centers), jnp.float32)),
        interpret=_interpret(),
    )(x2d, c2d, g2d, gh2d)
    dx_full = dx.reshape(-1)[:n].reshape(orig_shape)
    return dx_full, dc[0]


quantize_pallas.defvjp(_vjp_fwd, _vjp_bwd)
