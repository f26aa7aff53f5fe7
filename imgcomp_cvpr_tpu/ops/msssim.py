"""Multi-scale SSIM in XLA (batched, differentiable).

Two variants, mirroring the reference's split:

- ``msssim_train`` matches the reference's TF implementation used as the
  training distortion (ref: ms_ssim.py:115-186): separable 11-tap gaussian
  blur with VALID windows, and a 2-tap [1/2, 1/2] separable average +
  stride-2 subsample between scales (ref: ms_ssim.py:169,179-181).
- ``msssim_eval`` matches the reference's NumPy implementation used as the
  validation oracle (ref: ms_ssim_np.py:51-110): same SSIM-per-scale, but a
  2x2 box filter with 'reflect' boundary handling between scales
  (ref: ms_ssim_np.py:96,106-108) — this is the variant whose numbers are
  reported in measures.csv.

Both operate on NHWC float tensors in [0, max_val]; all convs are depthwise
2D convs that XLA fuses well on TPU. Images must be >= 176x176 at the top
scale for 5 levels of VALID 11x11 windows; callers pad smaller images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tf_compat

_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], np.float32)


def _fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    """2D gaussian matching MATLAB's fspecial (ref: ms_ssim_np.py:113-124)."""
    radius = size // 2
    offset = 0.0
    start, stop = -radius, radius + 1
    if size % 2 == 0:
        offset = 0.5
        stop -= 1
    x, y = np.mgrid[offset + start:stop, offset + start:stop]
    g = np.exp(-((x ** 2 + y ** 2) / (2.0 * sigma ** 2)))
    return (g / g.sum()).astype(np.float64)


def _gauss_kernel_1d(sigma: float, size: int) -> np.ndarray:
    n = size // 2
    x = np.arange(-n, n + 1, 1.0)
    g = np.exp(-x * x / (2 * sigma * sigma))
    return (g / np.sum(np.abs(g))).astype(np.float32)


def _blur_valid_separable(x: jax.Array, k1d: np.ndarray, pad: int = 0) -> jax.Array:
    """Depthwise separable VALID blur (both H and W)."""
    if pad:
        x = tf_compat.reflect_pad_hw(x, ((pad, pad // 2), (pad, pad // 2)))
    c = x.shape[-1]
    size = k1d.shape[0]
    # depthwise: weight (kh, kw, C, 1)
    w_row = jnp.broadcast_to(jnp.asarray(k1d, x.dtype).reshape(1, size, 1, 1), (1, size, c, 1))
    w_col = jnp.broadcast_to(jnp.asarray(k1d, x.dtype).reshape(size, 1, 1, 1), (size, 1, c, 1))
    y = tf_compat.depthwise_conv2d_valid(x, w_row)
    y = tf_compat.depthwise_conv2d_valid(y, w_col)
    return y


def _blur_valid_2d(x: jax.Array, k2d: np.ndarray) -> jax.Array:
    c = x.shape[-1]
    kh, kw = k2d.shape
    w = jnp.broadcast_to(jnp.asarray(k2d, x.dtype).reshape(kh, kw, 1, 1), (kh, kw, c, 1))
    return tf_compat.depthwise_conv2d_valid(x, w)


def _ssim_for_scale(img1, img2, blur, max_val, k1=0.01, k2=0.03):
    """SSIM mean + contrast sensitivity for one scale (ref: ms_ssim.py:81-112)."""
    mu1 = blur(img1)
    mu2 = blur(img2)
    sigma11 = blur(img1 * img1) - mu1 * mu1
    sigma22 = blur(img2 * img2) - mu2 * mu2
    sigma12 = blur(img1 * img2) - mu1 * mu2
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma11 + sigma22 + c2
    ssim = jnp.mean(((2.0 * mu1 * mu2 + c1) * v1) / ((mu1 * mu1 + mu2 * mu2 + c1) * v2))
    cs = jnp.mean(v1 / v2)
    return ssim, cs


def _downsample_train(x: jax.Array) -> jax.Array:
    """2-tap [.5,.5] separable avg with REFLECT pad (0,1), then stride 2
    (ref: ms_ssim.py:46-64,179-181)."""
    c = x.shape[-1]
    x = tf_compat.reflect_pad_hw(x, ((0, 1), (0, 1)))
    k = np.array([0.5, 0.5], np.float32)
    w_row = jnp.broadcast_to(jnp.asarray(k, x.dtype).reshape(1, 2, 1, 1), (1, 2, c, 1))
    w_col = jnp.broadcast_to(jnp.asarray(k, x.dtype).reshape(2, 1, 1, 1), (2, 1, c, 1))
    y = tf_compat.depthwise_conv2d_valid(x, w_row)
    y = tf_compat.depthwise_conv2d_valid(y, w_col)
    return y[:, ::2, ::2, :]


def _downsample_eval(x: jax.Array) -> jax.Array:
    """2x2 box filter with scipy.ndimage.convolve 'reflect' alignment (an
    even kernel reads offsets {0, +1}, so the reflect pad goes *after*;
    scipy 'reflect' == numpy 'symmetric'); then stride 2
    (ref: ms_ssim_np.py:96,106-108)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode='symmetric')
    c = x.shape[-1]
    k = np.full((2, 2), 0.25, np.float32)
    w = jnp.broadcast_to(jnp.asarray(k, x.dtype).reshape(2, 2, 1, 1), (2, 2, c, 1))
    y = tf_compat.depthwise_conv2d_valid(x, w)
    return y[:, ::2, ::2, :]


@functools.partial(jax.jit, static_argnames=('max_val', 'variant'))
def _msssim(img1: jax.Array, img2: jax.Array, max_val: float = 255.0,
            variant: str = 'train') -> jax.Array:
    assert img1.ndim == 4 and img1.shape == img2.shape, (img1.shape, img2.shape)
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    levels = _WEIGHTS.size
    weights = jnp.asarray(_WEIGHTS)
    mssim = []
    mcs = []
    im1, im2 = img1, img2
    for level in range(levels):
        h, w = im1.shape[1], im1.shape[2]
        size = min(11, h, w)
        sigma = size * 1.5 / 11
        if variant == 'train':
            k1d = _gauss_kernel_1d(sigma, size)
            # The reference's separable blur builds a 2*(size//2)+1-tap kernel
            # and reflect-pads (total_pad, total_pad//2) when it exceeds the
            # image width (ref: ms_ssim.py:16-29) — only hit at the last scale
            # of small crops.
            total_pad = max(k1d.shape[0] - w, 0)
            blur = functools.partial(_blur_valid_separable, k1d=k1d, pad=total_pad)
        else:
            blur = functools.partial(_blur_valid_2d, k2d=_fspecial_gauss(size, sigma))
        ssim, cs = _ssim_for_scale(im1, im2, blur, max_val)
        mssim.append(ssim)
        mcs.append(cs)
        if level < levels - 1:
            down = _downsample_train if variant == 'train' else _downsample_eval
            im1, im2 = down(im1), down(im2)
    mcs_t = jnp.stack(mcs)
    mssim_t = jnp.stack(mssim)
    if variant == 'train':
        # cs/ssim can go negative for uncorrelated images (early training);
        # negative ** fractional weight is NaN. Clamp in the training loss
        # only — at convergence both are positive, so no parity impact.
        mcs_t = jnp.maximum(mcs_t, 1e-6)
        mssim_t = jnp.maximum(mssim_t, 1e-6)
    return (jnp.prod(mcs_t[:levels - 1] ** weights[:levels - 1]) *
            (mssim_t[levels - 1] ** weights[levels - 1]))


def msssim_train(img1: jax.Array, img2: jax.Array, max_val: float = 255.0) -> jax.Array:
    """Differentiable MS-SSIM used as the training distortion."""
    return _msssim(img1, img2, max_val=max_val, variant='train')


def msssim_eval(img1: jax.Array, img2: jax.Array, max_val: float = 255.0) -> jax.Array:
    """MS-SSIM matching the NumPy eval oracle (measures.csv numbers)."""
    return _msssim(img1, img2, max_val=max_val, variant='eval')
