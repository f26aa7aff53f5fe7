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


def test_model_impl_switch_equivalence():
    """The IMGCOMP_QUANT_IMPL flag routes models/quantizer.quantize through
    the fused Pallas kernel; a full train-style forward+grad through the
    flagship encoder must match the XLA path (VERDICT r1 item 3)."""
    from imgcomp_cvpr_tpu.models import autoencoder as ae_lib
    from imgcomp_cvpr_tpu.utils import config as config_lib

    ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
    ae = ae_lib.get_network_cls(ae_config)(ae_config)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 255.0)
    variables = ae.init(jax.random.PRNGKey(0), x, True)

    def run(impl):
        def loss(params):
            enc, x_out = ae.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                x, True, mutable=['batch_stats'])[0]
            return jnp.mean((x_out - x) ** 2) + jnp.mean(enc.qbar ** 2)

        import os
        os.environ['IMGCOMP_QUANT_IMPL'] = impl
        try:
            val, grads = jax.value_and_grad(loss)(variables['params'])
        finally:
            os.environ.pop('IMGCOMP_QUANT_IMPL', None)
        return val, grads

    val_x, g_x = run('xla')
    val_p, g_p = run('pallas')
    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves(g_x)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(flat_x, flat_p):
        # rtol: grads traverse the whole decoder/encoder conv stack, where
        # op-order differences after the quantizer legitimately accumulate.
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-2, atol=2e-4)
