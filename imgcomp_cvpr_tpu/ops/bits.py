"""Bit-cost to bits-per-pixel conversion (ref: bits.py:4-20)."""

import jax
import jax.numpy as jnp


def num_pixels_in_input_batch(input_nhwc: jax.Array) -> int:
    assert input_nhwc.ndim == 4 and input_nhwc.shape[-1] == 3, input_nhwc.shape
    return input_nhwc.shape[0] * input_nhwc.shape[1] * input_nhwc.shape[2]


def bitcost_to_bpp(bit_cost: jax.Array, input_nhwc: jax.Array) -> jax.Array:
    """sum(bit_cost) / num_pixels. bit_cost: (N, h, w, C); input: (N, H, W, 3)."""
    assert bit_cost.ndim == 4 and input_nhwc.ndim == 4
    return jnp.sum(bit_cost) / jnp.float32(num_pixels_in_input_batch(input_nhwc))
