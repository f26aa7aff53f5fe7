"""Cross-framework parity fixture: TF1 graph formulas in pure numpy vs our
XLA ops (VERDICT r1 #6).

The A/B/C checkpoint oracles (BASELINE.md) cannot run without the released
TF1 checkpoints; this fixture guards the part that could silently break
parity anyway: the TF-'SAME' conv / conv2d_transpose padding arithmetic and
the slim BatchNorm inference formula. The numpy implementations below are
written directly from the TF1 documentation formulas (what the reference's
slim.conv2d / slim.batch_norm compute, ref autoencoder.py:98-125), NOT from
our op code — agreement to ~1e-5 means our XLA path implements TF semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.ops import tf_compat


def np_same_pad(size, k, s):
    out = int(np.ceil(size / s))
    pad_total = max((out - 1) * s + k - size, 0)
    lo = pad_total // 2
    return lo, pad_total - lo


def np_conv2d_same(x, w, stride):
    """TF conv2d 'SAME', NHWC x HWIO, naive loops."""
    n, h, wdt, cin = x.shape
    kh, kw, _, cout = w.shape
    ph = np_same_pad(h, kh, stride)
    pw = np_same_pad(wdt, kw, stride)
    xp = np.pad(x, ((0, 0), ph, pw, (0, 0)))
    ho = int(np.ceil(h / stride))
    wo = int(np.ceil(wdt / stride))
    out = np.zeros((n, ho, wo, cout), np.float64)
    for i in range(ho):
        for j in range(wo):
            patch = xp[:, i * stride:i * stride + kh,
                       j * stride:j * stride + kw, :]
            out[:, i, j, :] = np.einsum('nhwc,hwco->no', patch, w)
    return out


def np_conv2d_transpose_same(x, w, stride):
    """TF conv2d_transpose 'SAME' with output = input * stride; w is our
    (kh, kw, in, out) layout. Computed as the definitional scatter: the
    transpose op is the gradient of np_conv2d_same, so
    out[p] += x[i] * w[u] wherever the forward conv had out[i] += in[p] w[u].
    """
    n, h, wdt, cin = x.shape
    kh, kw, _, cout = w.shape
    ho, wo = h * stride, wdt * stride
    ph_lo, _ = np_same_pad(ho, kh, stride)
    pw_lo, _ = np_same_pad(wo, kw, stride)
    out = np.zeros((n, ho + kh, wo + kw, cout), np.float64)
    for i in range(h):
        for j in range(wdt):
            contrib = np.einsum('nc,uvco->nuvo', x[:, i, j, :], w)
            out[:, i * stride:i * stride + kh,
                j * stride:j * stride + kw, :] += contrib
    return out[:, ph_lo:ph_lo + ho, pw_lo:pw_lo + wo, :]


def np_batch_norm_inference(x, gamma, beta, mean, var, eps=1e-5):
    """slim.batch_norm inference formula (scale=True)."""
    return gamma * (x - mean) / np.sqrt(var + eps) + beta


@pytest.mark.parametrize('hw,k,s', [
    ((13, 17), 5, 2), ((16, 16), 5, 2), ((9, 11), 3, 1),
    ((8, 8), 3, 2), ((7, 5), 5, 1),
])
def test_conv2d_same_matches_tf_formula(hw, k, s):
    rng = np.random.RandomState(hash((hw, k, s)) % 2**31)
    x = rng.randn(2, hw[0], hw[1], 3).astype(np.float32)
    w = rng.randn(k, k, 3, 4).astype(np.float32)
    ours = np.asarray(tf_compat.conv2d_same(
        jnp.asarray(x), jnp.asarray(w), s,
        precision=jax.lax.Precision.HIGHEST))
    ref = np_conv2d_same(x, w, s)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize('hw,k,s', [
    ((8, 8), 3, 2), ((7, 9), 3, 2), ((8, 8), 5, 2), ((5, 6), 5, 2),
    ((6, 6), 2, 2),
])
def test_conv2d_transpose_same_matches_tf_formula(hw, k, s):
    rng = np.random.RandomState(hash((hw, k, s, 1)) % 2**31)
    x = rng.randn(2, hw[0], hw[1], 4).astype(np.float32)
    w = rng.randn(k, k, 4, 3).astype(np.float32)
    ours = np.asarray(tf_compat.conv2d_transpose_same(
        jnp.asarray(x), jnp.asarray(w), s,
        precision=jax.lax.Precision.HIGHEST))
    ref = np_conv2d_transpose_same(x, w, s)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_slim_conv_bn_inference_matches_tf_formula():
    """SlimConv (conv -> BN(inference) -> relu) against the numpy TF
    formulas end-to-end, with arbitrary (non-init) BN stats."""
    from imgcomp_cvpr_tpu.models.autoencoder import SlimConv

    rng = np.random.RandomState(99)
    x = rng.randn(2, 11, 13, 3).astype(np.float32)
    mod = SlimConv(features=5, kernel=5, stride=2)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    w = rng.randn(5, 5, 3, 5).astype(np.float32) * 0.2
    gamma = rng.rand(5).astype(np.float32) + 0.5
    beta = rng.randn(5).astype(np.float32)
    mean = rng.randn(5).astype(np.float32) * 0.1
    var = rng.rand(5).astype(np.float32) + 0.2

    variables = {
        'params': {'w': jnp.asarray(w),
                   'BatchNorm_0': {'scale': jnp.asarray(gamma),
                                   'bias': jnp.asarray(beta)}},
        'batch_stats': {'BatchNorm_0': {'mean': jnp.asarray(mean),
                                        'var': jnp.asarray(var)}},
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), False))

    ref = np_conv2d_same(x, w, 2)
    ref = np_batch_norm_inference(ref, gamma, beta, mean, var, eps=1e-5)
    ref = np.maximum(ref, 0.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
