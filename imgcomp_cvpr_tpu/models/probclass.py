"""Masked-3D-conv autoregressive context model ("probability classifier").

Re-implements the reference's `_ResShallow` network (ref: probclass.py:199-221)
TPU-first. The reference uses tf.nn.conv3d over an (N, D=channels, H, W, 1)
volume with causally masked kernels. 3D convs with a feature dim of 1 map
poorly onto the MXU, so here the masked 3D conv is reformulated as a sum of
kd 2D NHWC convs over depth-shifted slices with depth folded into the batch
dim — identical math, but every conv is a standard 2D conv XLA tiles well.

Causal masks (ref: probclass.py:150-176): only the *last* depth slice of the
kernel is masked; earlier slices see the full K x K window:
  - first mask (input layer): zero the center pixel, everything to its right,
    and all rows below it.
  - other mask (later layers): same but the center pixel is kept.

Network (ref: probclass.py:199-221): conv0 (first mask) -> 1 residual block
of two masked convs -> conv_out to L logits. NOTE: the reference's conv3d
defaults to a ReLU activation and the output layer does not override it, so
logits are ReLU'd (ref: probclass.py:220,227-233); we replicate exactly.

Geometry: kernel depth = K//2 + 1; with K=3 and 4 conv layers the receptive
field ("context size") is 4*(K-1)+1 = 9, context shape DHW = (5, 9, 9)
(ref: probclass.py:43-57,145-148).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import tf_compat

LOG2_E = float(np.log2(np.e))


def context_size(config) -> int:
    return num_layers() * (config.kernel_size - 1) + 1


def num_layers() -> int:
    # conv0 + 2 residual convs + conv_out (ref: probclass.py:208-212)
    return 4


def context_shape(config) -> Tuple[int, int, int]:
    cs = context_size(config)
    return (cs // 2 + 1, cs, cs)


def filter_depth(kernel_size: int) -> int:
    return kernel_size // 2 + 1


def spatial_mask(kernel_size: int, first: bool) -> np.ndarray:
    """(K, K) mask for the last depth slice of the kernel."""
    k = kernel_size
    m = np.ones((k, k), np.float32)
    c = k // 2
    if first:
        m[c, c:] = 0.0     # center pixel and everything to its right
    else:
        m[c, c + 1:] = 0.0  # everything strictly right of center
    m[c + 1:, :] = 0.0      # all rows below
    return m


class MaskedConv3D(nn.Module):
    """Causal 3D conv, VALID padding, computed as depth-folded 2D convs.

    Input (N, D, H, W, cin) -> output (N, D-kd+1, H-K+1, W-K+1, cout);
    output depth index i corresponds to input depth i+kd-1 (the causal
    "current" slice).
    """
    features: int
    kernel_size: int
    first: bool
    act: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kd = filter_depth(k)
        cin = x.shape[-1]
        w = self.param('w', nn.initializers.glorot_uniform(),
                       (kd, k, k, cin, self.features), jnp.float32)
        b = self.param('b', nn.initializers.zeros_init(), (self.features,), jnp.float32)
        mask = jnp.asarray(spatial_mask(k, self.first))[..., None, None]

        n, d, h, wdim, _ = x.shape
        d_out, h_out, w_out = d - kd + 1, h - k + 1, wdim - k + 1
        out = None
        for j in range(kd):
            wj = w[j] * mask if j == kd - 1 else w[j]
            xj = x[:, j:j + d_out].reshape(n * d_out, h, wdim, cin)
            yj = tf_compat.conv2d_valid(xj, wj)
            out = yj if out is None else out + yj
        out = out.reshape(n, d_out, h_out, w_out, self.features) + b
        if self.act:
            out = nn.relu(out)
        return out


class ResBlock3D(nn.Module):
    """Two masked convs + skip; the skip input is cropped to align with the
    VALID-shrunk output (ref: probclass.py:185-196)."""
    kernel_size: int

    @nn.compact
    def __call__(self, x: jax.Array, return_inner: bool = False):
        feats = x.shape[-1]
        k = self.kernel_size
        kd = filter_depth(k)
        y1 = MaskedConv3D(feats, k, first=False, act=True, name='conv1')(x)
        y = MaskedConv3D(feats, k, first=False, act=False, name='conv2')(y1)
        dd, ds = 2 * (kd - 1), k - 1  # depth / per-side spatial crop for 2 convs
        out = y + x[:, dd:, ds:-ds, ds:-ds, :]
        return (out, y1) if return_inner else out


class ResShallow(nn.Module):
    """conv0 (first mask) -> residual block -> conv to L logits (ReLU'd)."""
    config: Any
    num_centers: int

    @nn.compact
    def __call__(self, volume: jax.Array, return_activations: bool = False):
        """(N, D, H, W) padded float volume -> (N, D', H', W', L) logits.

        With return_activations, returns a dict of per-layer outputs
        (used by the activation-cached codec to seed its caches)."""
        cfg = self.config
        if getattr(cfg, 'learn_pad_var', False):
            # Learnable pad value (ref: probclass.py:307-338 pc_pad_grad).
            # Declared here so it lives in the PC param tree; consumed by
            # auto_pad_value() before padding, with gradients flowing back
            # through pad_volume's (v - pv) + pv formulation. NB the
            # reference parses this key but its bitcost hardcodes
            # learn_pad_var=False (ref: probclass.py:84) — we honor it.
            self.param('pad_var', nn.initializers.zeros_init(), ())
        k = cfg.kernel_size
        x = volume[..., None]
        l1 = MaskedConv3D(cfg.arch_param__k, k, first=True, name='conv0')(x)
        l3, l2 = ResBlock3D(k, name='res1')(l1, return_inner=True)
        # The reference's conv3d default leaves ReLU on the output layer.
        logits = MaskedConv3D(self.num_centers, k, first=False, act=True,
                              name='conv_out')(l3)
        if return_activations:
            return {'l1': l1, 'l2': l2, 'l3': l3, 'logits': logits}
        return logits


def get_network_cls(pc_config):
    return {'res_shallow': ResShallow}[pc_config.arch]


def pad_volume(volume_dhw: jax.Array, cs: int, pad_value) -> jax.Array:
    """Pad (N, D, H, W): depth gets cs//2 in *front* only (no filter sees the
    future), H/W get cs//2 on both sides (ref: probclass.py:268-292)."""
    pad = cs // 2
    assert pad >= 1
    widths = ((0, 0), (pad, 0), (pad, pad), (pad, pad))
    # Zero-pad (v - pv) then add pv back: equivalent to constant-padding with
    # pv, but differentiable w.r.t. a traced pv (grad through jnp.pad's
    # constant_values is broken in jax 0.9), and gradients flow into the pad
    # value like the reference's pc_pad_grad (ref: probclass.py:307-338).
    pv = jnp.asarray(pad_value, volume_dhw.dtype)
    return jnp.pad(volume_dhw - pv, widths) + pv


def unpad_volume(volume_dhw: jax.Array, cs: int) -> jax.Array:
    pad = cs // 2
    return volume_dhw[:, pad:, pad:-pad, pad:-pad]


class ProbClassifier:
    """Functional wrapper pairing the flax module with the padding/bitcost
    conventions (ref API: probclass.py:63-106)."""

    def __init__(self, pc_config, num_centers: int):
        self.config = pc_config
        self.num_centers = num_centers
        self.net = get_network_cls(pc_config)(pc_config, num_centers)
        self.context_size = context_size(pc_config)
        self.context_shape = context_shape(pc_config)

    def init(self, key: jax.Array, latent_shape_nhwc: Tuple[int, ...]):
        n, h, w, c = latent_shape_nhwc
        dummy = jnp.zeros((n, c + self.context_size // 2,
                           h + 2 * (self.context_size // 2),
                           w + 2 * (self.context_size // 2)), jnp.float32)
        return self.net.init(key, dummy)

    def logits_from_padded(self, params, padded_dhw: jax.Array) -> jax.Array:
        return self.net.apply(params, padded_dhw)

    def logits(self, params, q_nhwc: jax.Array, pad_value) -> jax.Array:
        """(N, H, W, C) latent -> (N, D=C, H, W, L) logits for every symbol."""
        vol = jnp.transpose(q_nhwc, (0, 3, 1, 2))
        padded = pad_volume(vol, self.context_size, pad_value)
        logits = self.net.apply(params, padded)
        # VALID convs consume exactly the padding: shapes must round-trip.
        assert logits.shape[1:4] == vol.shape[1:4], (logits.shape, vol.shape)
        return logits

    def bitcost(self, params, q_nhwc: jax.Array, symbols_nhwc: jax.Array,
                pad_value) -> jax.Array:
        """Per-symbol bit cost, returned NHWC like its inputs
        (cross entropy in bits, ref: probclass.py:100-106)."""
        logits = self.logits(params, q_nhwc, pad_value)  # (N, D, H, W, L)
        targets = jnp.transpose(symbols_nhwc, (0, 3, 1, 2))
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
        bc = nll * LOG2_E
        return jnp.transpose(bc, (0, 2, 3, 1))  # back to NHWC


def auto_pad_value(pc_config, centers: jax.Array, pc_params=None):
    """Pad value for the context model's causal padding.

    Priority: the learned pad variable when `learn_pad_var` is set (the
    reference defines pc_pad_grad for this, ref: probclass.py:307-338, but
    its bitcost hardcodes it off, ref: probclass.py:84 — here it is honored),
    else centers[0] when `use_centers_for_padding`, else 0
    (ref: probclass.py:59-61). Gradients flow into the returned value via
    pad_volume's (v - pv) + pv formulation either way."""
    if getattr(pc_config, 'learn_pad_var', False):
        if pc_params is None:
            raise ValueError('learn_pad_var=True requires pc_params to '
                             'resolve the learned pad variable')
        return pc_params['params']['pad_var']
    return centers[0] if pc_config.use_centers_for_padding else jnp.float32(0)
