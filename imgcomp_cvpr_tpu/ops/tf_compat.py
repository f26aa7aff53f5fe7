"""Convolution primitives with TF-1.x 'SAME' semantics, NHWC, on XLA.

The reference architecture (ref: autoencoder.py:218-268) is built from
slim.conv2d / slim.conv2d_transpose with 'SAME' padding and stride 2.
For checkpoint-level parity we reproduce TF's exact padding arithmetic:

- conv 'SAME', stride s: pad_total = max((ceil(H/s)-1)*s + k - H, 0),
  pad_lo = pad_total // 2 (the extra pad goes at the end).
- conv2d_transpose 'SAME' is the gradient of that conv: implemented as
  `lax.conv_general_dilated` with `lhs_dilation = s` and padding
  (k-1-pad_lo, k-1-pad_hi), kernel spatially flipped with in/out swapped.

XLA's own 'SAME' matches TF for the forward conv; we still compute padding
explicitly so the transpose direction is exact for any (k, s, H).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DN_2D = ('NHWC', 'HWIO', 'NHWC')

# Default conv precision. On TPU, XLA's DEFAULT runs f32 convs with bf16
# inputs on the MXU (fast); HIGHEST uses 3-pass f32 emulation. Model convs
# default to fast; numerics-sensitive paths (metrics, entropy-coding logits)
# pass precision explicitly.
DEFAULT_PRECISION: Optional[lax.Precision] = None


def same_pad_amounts(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF 'SAME' (pad_lo, pad_hi) for one spatial dim."""
    out = -(-size // s)  # ceil
    pad_total = max((out - 1) * s + k - size, 0)
    lo = pad_total // 2
    return lo, pad_total - lo


def conv2d_same(x: jax.Array, w: jax.Array, stride: int = 1,
                dilation: int = 1, precision=None) -> jax.Array:
    """2D conv, NHWC x HWIO -> NHWC, TF-'SAME' padding."""
    kh, kw = w.shape[0], w.shape[1]
    eff_kh = (kh - 1) * dilation + 1
    eff_kw = (kw - 1) * dilation + 1
    ph = same_pad_amounts(x.shape[1], eff_kh, stride)
    pw = same_pad_amounts(x.shape[2], eff_kw, stride)
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=(ph, pw),
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN_2D,
        precision=precision or DEFAULT_PRECISION)


def conv2d_transpose_same(x: jax.Array, w: jax.Array, stride: int,
                          precision=None) -> jax.Array:
    """2D transpose conv matching tf.nn.conv2d_transpose(..., padding='SAME')
    with output spatial dims = input * stride.

    ``w`` is (kh, kw, I=x channels, O=output channels).
    Implemented as the gradient of a TF-'SAME' strided conv (ref decoder,
    autoencoder.py:246-268 uses slim.conv2d_transpose).
    """
    kh, kw = w.shape[0], w.shape[1]
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = h_in * stride, w_in * stride
    # Padding of the forward conv (h_out -> h_in) this op is the transpose of.
    ph_lo, ph_hi = same_pad_amounts(h_out, kh, stride)
    pw_lo, pw_hi = same_pad_amounts(w_out, kw, stride)
    # Gradient-of-conv padding.
    pad_h = (kh - 1 - ph_lo, kh - 1 - ph_hi)
    pad_w = (kw - 1 - pw_lo, kw - 1 - pw_hi)
    # ``w`` is (kh, kw, in=x_ch, out); the forward conv this op is the gradient
    # of uses the (kh, kw, out, in) transpose, so the gradient formula
    # (flip spatially, swap in/out) lands back on ``w`` flipped only.
    w_t = jnp.flip(w, axis=(0, 1))
    y = lax.conv_general_dilated(
        x, w_t, window_strides=(1, 1), padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride), dimension_numbers=_DN_2D,
        precision=precision or DEFAULT_PRECISION)
    assert y.shape[1] == h_out and y.shape[2] == w_out, (y.shape, h_out, w_out)
    return y


def conv2d_valid(x: jax.Array, w: jax.Array, precision=None) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding='VALID', dimension_numbers=_DN_2D,
        precision=precision or DEFAULT_PRECISION)


def depthwise_conv2d_valid(x: jax.Array, w: jax.Array,
                           precision=lax.Precision.HIGHEST) -> jax.Array:
    """Depthwise VALID conv; w: (kh, kw, C, 1). Defaults to HIGHEST precision
    since its only users are metric blurs."""
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, w.reshape(w.shape[0], w.shape[1], 1, c), window_strides=(1, 1),
        padding='VALID', dimension_numbers=_DN_2D, feature_group_count=c,
        precision=precision)


def reflect_pad_hw(x: jax.Array, pad: Sequence[Tuple[int, int]]) -> jax.Array:
    """REFLECT pad on H and W of an NHWC tensor."""
    (ph_lo, ph_hi), (pw_lo, pw_hi) = pad
    return jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)), mode='reflect')
