import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.models import autoencoder, probclass, quantizer
from imgcomp_cvpr_tpu.ops import bits
from imgcomp_cvpr_tpu.utils import config as config_lib


def small_ae_config(**over):
    cfg, _ = config_lib.parse_spec('cvpr/low', 'ae')
    # Tiny network for tests.
    updates = dict(arch_param_B=1, num_chan_bn=4)
    updates.update(over)
    return cfg.replace(**updates)


def small_pc_config(**over):
    cfg, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    updates = dict(arch_param__k=8)
    updates.update(over)
    return cfg.replace(**updates)


# ---------------- quantizer ----------------

def test_quantize_hard_is_nearest_center():
    centers = jnp.array([-1.0, 0.0, 2.0])
    x = jnp.array([[-3.0, -0.4, 0.6, 1.2, 5.0]])
    out = quantizer.quantize(x, centers)
    np.testing.assert_array_equal(out.symbols, [[0, 1, 1, 2, 2]])
    np.testing.assert_allclose(out.qhard, [[-1.0, 0.0, 0.0, 2.0, 2.0]])


def test_quantize_straight_through_gradient():
    centers = jnp.array([-1.0, 0.0, 1.0])

    def f(x):
        return jnp.sum(quantizer.quantize(x, centers).qbar)

    def f_soft(x):
        return jnp.sum(quantizer.quantize(x, centers).qsoft)

    x = jnp.array([0.3, -0.7, 0.9])
    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_soft)(x), rtol=1e-6)


def test_quantize_qsoft_in_hull():
    key = jax.random.PRNGKey(0)
    centers = quantizer.init_centers(key, 6, (-2, 2))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3)) * 3
    out = quantizer.quantize(x, centers)
    assert out.qsoft.min() >= centers.min() - 1e-5
    assert out.qsoft.max() <= centers.max() + 1e-5
    assert out.qbar.shape == x.shape
    assert out.symbols.dtype == jnp.int32


# ---------------- heatmap ----------------

def test_heatmap3d_formula():
    n, h, w, c = 1, 2, 2, 5
    b = np.random.RandomState(0).randn(n, h, w, c + 1).astype(np.float32)
    hm = np.asarray(autoencoder.get_heatmap3d(jnp.asarray(b)))
    hm2d = 1 / (1 + np.exp(-b[..., 0])) * c
    for ci in range(c):
        np.testing.assert_allclose(hm[..., ci], np.clip(hm2d - ci, 0, 1),
                                   rtol=1e-5, atol=1e-6)
    # saturated heatmap => all ones
    big = np.full((1, 1, 1, c + 1), 100.0, np.float32)
    np.testing.assert_allclose(np.asarray(autoencoder.get_heatmap3d(jnp.asarray(big)))[0, 0, 0],
                               np.ones(c), atol=1e-6)


# ---------------- autoencoder ----------------

def test_ae_shapes_and_range():
    cfg = small_ae_config()
    model = autoencoder.CVPRAutoencoder(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 48, 3)) * 255.0
    variables = model.init(jax.random.PRNGKey(1), x, False)
    enc, x_out = model.apply(variables, x, False)
    assert enc.qbar.shape == (2, 4, 6, cfg.num_chan_bn)
    assert enc.symbols.shape == (2, 4, 6, cfg.num_chan_bn)
    assert enc.heatmap.shape == (2, 4, 6, cfg.num_chan_bn)
    assert x_out.shape == x.shape
    assert float(x_out.min()) >= 0.0 and float(x_out.max()) <= 255.0
    centers = autoencoder.get_centers(variables)
    assert centers.shape == (cfg.num_centers,)
    # symbols index into centers; qhard == centers[symbols]
    np.testing.assert_allclose(np.asarray(enc.qhard),
                               np.asarray(centers)[np.asarray(enc.symbols)], rtol=1e-6)


def test_ae_heatmap_masks_bottleneck():
    cfg = small_ae_config()
    model = autoencoder.CVPRAutoencoder(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3)) * 255.0
    variables = model.init(jax.random.PRNGKey(1), x, False)
    enc, _ = model.apply(variables, x, False)
    # z is already masked: wherever heatmap == 0, z must be 0.
    z = np.asarray(enc.z)
    hm = np.asarray(enc.heatmap)
    assert np.all(z[hm == 0.0] == 0.0)


def test_ae_train_mode_updates_batch_stats():
    cfg = small_ae_config()
    model = autoencoder.CVPRAutoencoder(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3)) * 255.0
    variables = model.init(jax.random.PRNGKey(1), x, False)
    _, new_state = model.apply(variables, x, True, mutable=['batch_stats'])
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(new_state['batch_stats'])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


# ---------------- probclass ----------------

def test_context_geometry():
    cfg = small_pc_config()
    assert probclass.context_size(cfg) == 9
    assert probclass.context_shape(cfg) == (5, 9, 9)
    assert probclass.filter_depth(cfg.kernel_size) == 2


def test_masks():
    first = probclass.spatial_mask(3, first=True)
    other = probclass.spatial_mask(3, first=False)
    np.testing.assert_array_equal(first, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
    np.testing.assert_array_equal(other, [[1, 1, 1], [1, 1, 0], [0, 0, 0]])


def test_pc_shapes_and_bitcost():
    cfg = small_pc_config()
    pc = probclass.ProbClassifier(cfg, num_centers=6)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 7, 4))
    syms = jax.random.randint(jax.random.PRNGKey(1), (2, 6, 7, 4), 0, 6)
    params = pc.init(jax.random.PRNGKey(2), q.shape)
    bc = pc.bitcost(params, q, syms, pad_value=0.0)
    assert bc.shape == q.shape
    assert np.all(np.asarray(bc) >= 0.0)


def test_pc_causality():
    """Logits at (d, h, w) must not depend on the input at (d, h, w) or any
    position after it in (d, h, w)-raster order (SURVEY.md §4 property test)."""
    cfg = small_pc_config()
    pc = probclass.ProbClassifier(cfg, num_centers=4)
    rng = np.random.RandomState(0)
    n, h, w, c = 1, 5, 6, 4  # D=C=4
    q = rng.randn(n, h, w, c).astype(np.float32)
    params = pc.init(jax.random.PRNGKey(0), (n, h, w, c))

    logits_fn = jax.jit(lambda qq: pc.logits(params, qq, pad_value=0.0))
    base = np.asarray(logits_fn(jnp.asarray(q)))  # (N, D, H, W, L)

    for trial in range(6):
        d0 = rng.randint(c)
        h0 = rng.randint(h)
        w0 = rng.randint(w)
        q2 = q.copy()
        q2[0, h0, w0, d0] += 10.0  # NHWC input: depth == channel axis
        pert = np.asarray(logits_fn(jnp.asarray(q2)))
        diff = np.abs(pert - base).sum(axis=-1)[0]  # (D, H, W)
        order0 = (d0 * h + h0) * w + w0
        for d in range(c):
            for hh in range(h):
                for ww in range(w):
                    order = (d * h + hh) * w + ww
                    if order <= order0:
                        assert diff[d, hh, ww] == 0.0, (
                            f'logits at {(d, hh, ww)} leaked from {(d0, h0, w0)}')


def test_pc_padding_roundtrip():
    v = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    padded = probclass.pad_volume(v, 9, pad_value=7.0)
    assert padded.shape == (2, 7, 12, 13)
    np.testing.assert_array_equal(np.asarray(probclass.unpad_volume(padded, 9)), np.asarray(v))
    assert float(padded[0, 0, 0, 0]) == 7.0


def test_bitcost_to_bpp():
    bc = jnp.ones((2, 4, 4, 8))  # 256 bits
    x = jnp.zeros((2, 32, 32, 3))  # 2048 pixels
    assert float(bits.bitcost_to_bpp(bc, x)) == pytest.approx(256 / 2048)
