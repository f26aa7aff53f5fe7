"""Distortion metrics: MSE / PSNR per image (ref: train.py:402-426, val.py:227-237)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_per_image(inp: jax.Array, otp: jax.Array, cast_to_int: bool) -> jax.Array:
    """(N, H, W, C) -> (N,). If cast_to_int, round through int32 first to
    measure real-world (quantized-pixel) error (ref: train.py:403-419)."""
    if cast_to_int:
        inp = inp.astype(jnp.int32)
        otp = otp.astype(jnp.int32)
    se = jnp.square((otp - inp).astype(jnp.float32))
    return jnp.mean(se, axis=(1, 2, 3))


def psnr_per_image(inp: jax.Array, otp: jax.Array, cast_to_int: bool) -> jax.Array:
    mse = mse_per_image(inp, otp, cast_to_int)
    return jnp.where(mse == 0.0, jnp.inf,
                     10.0 * jnp.log10(255.0 * 255.0 / jnp.maximum(mse, 1e-20)))


def psnr_np(img1, img2, max_val: float = 255.0) -> float:
    """Host-side PSNR over uint8 arrays (skimage.compare_psnr semantics,
    ref: val.py:227-237). Identical images -> inf, without the numpy
    divide-by-zero RuntimeWarning."""
    import numpy as np
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0.0:
        return float('inf')
    return float(10.0 * np.log10(max_val * max_val / mse))
