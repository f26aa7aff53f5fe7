"""Pallas fused quantizer vs the XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.models import quantizer
from imgcomp_cvpr_tpu.ops.pallas import quantize as pq


def _setup(seed=0, shape=(2, 16, 16, 8)):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2)
    centers = jnp.asarray(np.sort(rng.uniform(-2, 2, 6)).astype(np.float32))
    return x, centers


def test_forward_matches_xla():
    x, centers = _setup()
    ref = quantizer.quantize(x, centers)
    out = jax.jit(pq.quantize_pallas, static_argnums=2)(x, centers, 1.0)
    np.testing.assert_array_equal(np.asarray(out.symbols), np.asarray(ref.symbols))
    np.testing.assert_allclose(np.asarray(out.qhard), np.asarray(ref.qhard), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.qsoft), np.asarray(ref.qsoft),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.qbar), np.asarray(ref.qbar),
                               rtol=1e-5, atol=1e-6)


def test_forward_non_tile_aligned_shape():
    x, centers = _setup(shape=(3, 7, 5, 3))
    ref = quantizer.quantize(x, centers)
    out = pq.quantize_pallas(x, centers, 1.0)
    np.testing.assert_array_equal(np.asarray(out.symbols), np.asarray(ref.symbols))
    np.testing.assert_allclose(np.asarray(out.qsoft), np.asarray(ref.qsoft),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_xla():
    x, centers = _setup(shape=(4, 8, 8, 4))

    def loss_ref(x, c):
        out = quantizer.quantize(x, c)
        return jnp.sum(out.qbar * jnp.cos(out.qbar)) + jnp.sum(out.qsoft ** 2)

    def loss_pal(x, c):
        out = pq.quantize_pallas(x, c, 1.0)
        return jnp.sum(out.qbar * jnp.cos(out.qbar)) + jnp.sum(out.qsoft ** 2)

    gx_ref, gc_ref = jax.grad(loss_ref, argnums=(0, 1))(x, centers)
    gx_pal, gc_pal = jax.grad(loss_pal, argnums=(0, 1))(x, centers)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gc_pal), np.asarray(gc_ref),
                               rtol=2e-4, atol=2e-4)


def test_qhard_gradient_to_centers():
    x, centers = _setup(shape=(2, 8, 8, 2))

    def loss_ref(c):
        return jnp.sum(quantizer.quantize(x, c).qhard ** 2)

    def loss_pal(c):
        return jnp.sum(pq.quantize_pallas(x, c, 1.0).qhard ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_pal)(centers)),
                               np.asarray(jax.grad(loss_ref)(centers)),
                               rtol=1e-4, atol=1e-4)
