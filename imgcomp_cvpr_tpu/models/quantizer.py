"""Soft-to-hard scalar quantization against learned centers.

Re-implements the reference's quantizer semantics (ref: quantizer.py:37-95)
as pure JAX on channels-last tensors:

- ``dist[..., l] = (x - centers[l])**2``
- ``phi_soft = softmax(-sigma * dist)`` over the center axis
- hard assignment = argmin(dist) (the reference's softmax with sigma=1e7 +
  argmax picks the same index), one-hot
- ``qsoft = phi_soft @ centers``; ``qhard = centers[symbols]``
- straight-through ``qbar = qsoft + stop_grad(qhard - qsoft)``
  (ref: autoencoder.py:127-134)

Everything is vectorized over arbitrary leading dims; the center axis L is
tiny (6), so XLA fuses this into the surrounding convs. A fused Pallas
kernel lives in ops/pallas/quantize.py for the hot path.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantizerOutput(NamedTuple):
    qbar: jax.Array    # straight-through soft/hard mix, same shape as x
    qsoft: jax.Array   # soft assignment expectation
    qhard: jax.Array   # nearest center
    symbols: jax.Array  # int32 indices into centers


def _resolve_impl(impl: Optional[str]) -> str:
    """'pallas' | 'xla'; default comes from IMGCOMP_QUANT_IMPL (auto routes
    to the fused Pallas kernel on TPU, the XLA path elsewhere)."""
    impl = impl or os.environ.get('IMGCOMP_QUANT_IMPL', 'auto')
    assert impl in ('auto', 'pallas', 'xla'), impl
    if impl == 'auto':
        impl = 'pallas' if jax.default_backend() == 'tpu' else 'xla'
    return impl


def quantize(x: jax.Array, centers: jax.Array, sigma: float = 1.0,
             impl: Optional[str] = None) -> QuantizerOutput:
    assert centers.ndim == 1, centers.shape
    if _resolve_impl(impl) == 'pallas':
        from ..ops.pallas.quantize import quantize_pallas
        out = quantize_pallas(x, centers, sigma)
        return QuantizerOutput(out.qbar, out.qsoft, out.qhard, out.symbols)
    x_exp = x[..., None]                                  # (..., 1)
    dist = jnp.square(x_exp - centers)                    # (..., L)
    phi_soft = jax.nn.softmax(-sigma * dist, axis=-1)
    symbols = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    qsoft = jnp.sum(phi_soft * centers, axis=-1)
    qhard = centers[symbols]
    qbar = qsoft + jax.lax.stop_gradient(qhard - qsoft)
    return QuantizerOutput(qbar, qsoft, qhard, symbols)


def init_centers(key: jax.Array, num_centers: int, initial_range) -> jax.Array:
    """Uniform init in ``centers_initial_range`` (ref: quantizer.py:28-31)."""
    lo, hi = map(float, initial_range)
    return jax.random.uniform(key, (num_centers,), jnp.float32, lo, hi)


def centers_regularization(centers: jax.Array, factor: float) -> jax.Array:
    """factor * l2_loss(centers) == factor * sum(c^2)/2 (ref: quantizer.py:18-24)."""
    if not factor:
        return jnp.zeros((), jnp.float32)
    return factor * 0.5 * jnp.sum(jnp.square(centers))
