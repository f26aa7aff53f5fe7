import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.ops import metrics, msssim, msssim_np


def _pair(h=192, w=192, seed=0, noise=20.0):
    rng = np.random.RandomState(seed)
    base = rng.rand(1, h, w, 3) * 255.0
    # smooth it a bit so it looks image-like
    img1 = base
    img2 = np.clip(base + rng.randn(1, h, w, 3) * noise, 0, 255)
    return img1.astype(np.float32), img2.astype(np.float32)


def test_identical_images_score_one():
    img, _ = _pair()
    assert msssim_np.msssim(img, img) == pytest.approx(1.0, abs=1e-9)
    assert float(msssim.msssim_eval(jnp.asarray(img), jnp.asarray(img))) == pytest.approx(1.0, abs=1e-5)
    assert float(msssim.msssim_train(jnp.asarray(img), jnp.asarray(img))) == pytest.approx(1.0, abs=1e-5)


def test_eval_variant_matches_np_oracle():
    for seed, noise in [(0, 10.0), (1, 30.0), (2, 60.0)]:
        img1, img2 = _pair(seed=seed, noise=noise)
        ref = msssim_np.msssim(img1, img2)
        ours = float(msssim.msssim_eval(jnp.asarray(img1), jnp.asarray(img2)))
        assert ours == pytest.approx(ref, abs=2e-4), (seed, noise, ref, ours)


def test_train_variant_close_to_oracle():
    # Different downsample filter => only loose agreement expected.
    img1, img2 = _pair(noise=25.0)
    ref = msssim_np.msssim(img1, img2)
    ours = float(msssim.msssim_train(jnp.asarray(img1), jnp.asarray(img2)))
    assert ours == pytest.approx(ref, abs=2e-2)


def test_monotone_in_noise():
    img1, img2a = _pair(noise=10.0)
    _, img2b = _pair(noise=60.0)
    a = float(msssim.msssim_eval(jnp.asarray(img1), jnp.asarray(img2a)))
    b = float(msssim.msssim_eval(jnp.asarray(img1), jnp.asarray(img2b)))
    assert 0.0 < b < a < 1.0


def test_train_variant_differentiable():
    import jax
    img1, img2 = _pair(h=176, w=176, noise=15.0)

    def loss(x):
        return 1.0 - msssim.msssim_train(jnp.asarray(img1), x)

    g = jax.grad(loss)(jnp.asarray(img2))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_psnr():
    img1 = np.zeros((1, 8, 8, 3), np.uint8)
    img2 = np.full((1, 8, 8, 3), 10, np.uint8)
    expected = 10 * np.log10(255 ** 2 / 100)
    assert metrics.psnr_np(img1, img2) == pytest.approx(expected)
    got = metrics.psnr_per_image(jnp.asarray(img1, jnp.float32),
                                 jnp.asarray(img2, jnp.float32), cast_to_int=True)
    assert float(got[0]) == pytest.approx(expected, rel=1e-5)


def test_train_variant_gradient_matches_numerical():
    import jax
    img1, img2 = _pair(h=176, w=176, noise=15.0)
    x = jnp.asarray(img2)

    def f(x):
        return msssim.msssim_train(jnp.asarray(img1), x)

    g = np.asarray(jax.grad(f)(x))
    rng = np.random.RandomState(0)
    for _ in range(3):
        i, j, c = rng.randint(176), rng.randint(176), rng.randint(3)
        eps = 0.5
        xp = np.asarray(img2).copy(); xp[0, i, j, c] += eps
        xm = np.asarray(img2).copy(); xm[0, i, j, c] -= eps
        num = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
        assert num == pytest.approx(float(g[0, i, j, c]), abs=3e-5), (i, j, c)
