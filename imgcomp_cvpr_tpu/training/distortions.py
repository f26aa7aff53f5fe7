"""Distortion measures and the scaled distortion-to-minimize
(ref: train.py:352-431).

- mse / psnr are computed through an int cast whenever they are not the
  quantity being optimized (pixels are quantized in the real world).
- d_loss_scaled: mse | K_psnr - psnr | K_ms_ssim * (1 - ms_ssim).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import metrics, msssim


def compute(ae_config, x: jax.Array, x_out: jax.Array, is_training: bool
            ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """x, x_out: (N, H, W, 3) float in [0, 255]. Returns (d_loss_scaled, comps)."""
    minimize_for = ae_config.distortion_to_minimize
    assert minimize_for in ('mse', 'psnr', 'ms_ssim'), minimize_for

    cast_for_psnr = (not is_training) or minimize_for != 'psnr'
    cast_for_mse = (not is_training) or minimize_for != 'mse'
    mse = jnp.mean(metrics.mse_per_image(x, x_out, cast_for_mse))
    psnr = jnp.mean(metrics.psnr_per_image(x, x_out, cast_for_psnr))
    ms_ssim_val: Optional[jax.Array] = None
    if minimize_for == 'ms_ssim':
        ms_ssim_val = msssim.msssim_train(x, x_out)

    if minimize_for == 'mse':
        d_loss = mse
    elif minimize_for == 'psnr':
        d_loss = ae_config.K_psnr - psnr
    else:
        d_loss = ae_config.K_ms_ssim * (1.0 - ms_ssim_val)

    comps = {'mse': mse, 'psnr': psnr}
    if ms_ssim_val is not None:
        comps['ms_ssim'] = ms_ssim_val
    return d_loss, comps
