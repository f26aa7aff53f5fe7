"""Convolutional autoencoder with importance map ("heatmap").

TPU-native re-implementation of the reference's 'CVPR' architecture
(ref: autoencoder.py:213-268): NHWC layout, flax.linen modules, XLA convs
with TF-'SAME' semantics (ops/tf_compat.py). Structure:

Encoder (ref `_CVPR._encode`, autoencoder.py:218-244):
  normalize -> conv5x5/2 (n/2) -> conv5x5/2 (n) -> B x [3 residual blocks]
  with block skips -> final residual (no act) + global skip
  -> conv5x5/2 to C(+1 heatmap) channels -> heatmap mask -> quantize.

Decoder (ref `_CVPR._decode`, autoencoder.py:246-268):
  convT3x3/2 (n) -> B x [3 residual blocks] + skips -> final residual
  -> convT5x5/2 (n/2) -> convT5x5/2 (3) -> denormalize -> clip [0,255].

Every conv is followed by fused BatchNorm (decay 0.9, eps 1e-5, scale)
and ReLU unless noted, mirroring slim's conv2d(normalizer_fn=batch_norm)
(ref: autoencoder.py:106-125). The heatmap construction follows
`_get_heatmap3D` (ref: autoencoder.py:171-194):
``hm3d[n,h,w,c] = clip(sigmoid(b[...,0]) * C - c, 0, 1)``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import tf_compat
from . import quantizer as quantizer_lib

ARCH_PARAM_N = 128  # ref: autoencoder.py:210
SUBSAMPLING_FACTOR = 8  # three stride-2 stages, ref: autoencoder.py:214-216

# Fixed input normalization statistics (RGB, image domain 0..255),
# ref: autoencoder.py:160-169.
_NORM_MEAN = np.array([121.85369873, 113.58860779, 100.63715363], np.float32)
_NORM_VAR = np.array([4746.37695312, 4454.13964844, 4812.234375], np.float32)


class EncoderOutput(NamedTuple):
    qbar: jax.Array              # (N, H', W', C) straight-through quantized
    qhard: jax.Array             # (N, H', W', C) nearest-center values
    symbols: jax.Array           # (N, H', W', C) int32 center indices
    z: jax.Array                 # (N, H', W', C) pre-quantization bottleneck
    heatmap: Optional[jax.Array]  # (N, H', W', C) in [0, 1], or None


class SlimConv(nn.Module):
    """conv (no bias) -> BatchNorm -> optional ReLU, TF-'SAME'.

    ``dtype`` is the compute/activation dtype; params stay float32. The
    128-channel residual towers are HBM-bandwidth-bound on TPU (measured
    ~440 GB/s of activation traffic at f32, 6% MXU utilization), so
    bfloat16 activations ~double AE throughput; quality impact is
    measured in PERF.md."""
    features: int
    kernel: int
    stride: int = 1
    act: bool = True
    transpose: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        in_ch = x.shape[-1]
        w = self.param('w', nn.initializers.glorot_uniform(),
                       (self.kernel, self.kernel, in_ch, self.features), jnp.float32)
        x = x.astype(self.dtype)
        w = w.astype(self.dtype)
        if self.transpose:
            y = tf_compat.conv2d_transpose_same(x, w, self.stride)
        else:
            y = tf_compat.conv2d_same(x, w, self.stride)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_bias=True, use_scale=True,
                         dtype=self.dtype)(y)
        if self.act:
            y = nn.relu(y)
        return y


class ResidualBlock(nn.Module):
    """Two 3x3 convs (BN after each, ReLU between) + identity skip
    (ref: autoencoder.py:274-287). ``act`` False replicates the reference's
    residual_block(..., activation_fn=None) where *both* convs lose the ReLU."""
    features: int
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = SlimConv(self.features, 3, act=self.act, dtype=self.dtype,
                     name='conv1')(x, train)
        y = SlimConv(self.features, 3, act=False, dtype=self.dtype,
                     name='conv2')(y, train)
        return y + x.astype(y.dtype)


class Encoder(nn.Module):
    config: any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> EncoderOutput:
        cfg = self.config
        n = ARCH_PARAM_N
        centers = self.param(
            'centers',
            lambda key: quantizer_lib.init_centers(
                key, cfg.num_centers, cfg.centers_initial_range))

        dt = self.dtype
        net = normalize(x, cfg.normalization)
        net = SlimConv(n // 2, 5, stride=2, dtype=dt, name='h1')(net, train)
        net = SlimConv(n, 5, stride=2, dtype=dt, name='h2')(net, train)
        residual_input_0 = net
        for b in range(cfg.arch_param_B):
            residual_input_b = net
            for i in range(3):
                net = ResidualBlock(n, dtype=dt,
                                    name=f'res_block_enc_{b}_{i + 1}')(net, train)
            net = net + residual_input_b
        net = ResidualBlock(n, act=False, dtype=dt,
                            name='res_block_enc_final')(net, train)
        net = net + residual_input_0

        num_out = cfg.num_chan_bn + (1 if cfg.heatmap else 0)
        net = SlimConv(num_out, 5, stride=2, act=False, dtype=dt,
                       name='to_bn')(net, train)
        # The bottleneck, importance map, and quantizer stay float32: the
        # center assignment (symbols) and the rate path are precision-
        # sensitive, and their cost is negligible next to the towers.
        net = net.astype(jnp.float32)

        if cfg.heatmap:
            heatmap = get_heatmap3d(net)
            net = heatmap * net[..., 1:]
        else:
            heatmap = None

        q = quantizer_lib.quantize(net, centers, sigma=1.0)
        return EncoderOutput(q.qbar, q.qhard, q.symbols, net, heatmap)


class Decoder(nn.Module):
    config: any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, train: bool) -> jax.Array:
        cfg = self.config
        n = ARCH_PARAM_N
        dt = self.dtype
        net = SlimConv(n, 3, stride=2, transpose=True, dtype=dt,
                       name='from_bn')(q, train)
        residual_input_0 = net
        for b in range(cfg.arch_param_B):
            residual_input_b = net
            for i in range(3):
                net = ResidualBlock(n, dtype=dt,
                                    name=f'res_block_dec_{b}_{i + 1}')(net, train)
            net = net + residual_input_b
        net = ResidualBlock(n, act=False, dtype=dt,
                            name='dec_after_res')(net, train)
        net = net + residual_input_0
        net = SlimConv(n // 2, 5, stride=2, transpose=True, dtype=dt,
                       name='h12')(net, train)
        net = SlimConv(3, 5, stride=2, transpose=True, act=False, dtype=dt,
                       name='h13')(net, train)
        # Denormalize/clip in float32 regardless of compute dtype.
        net = denormalize(net.astype(jnp.float32), cfg.normalization)
        return jnp.clip(net, 0.0, 255.0)


class CVPRAutoencoder(nn.Module):
    """Top-level AE; encode/decode are separate methods so val/train drivers
    can call them independently (ref API: autoencoder.py:50-63).

    ``dtype`` sets the conv-tower compute dtype (params always float32;
    the quantizer, heatmap, and (de)normalization always float32).
    bfloat16 roughly doubles inference throughput on TPU — the towers
    are HBM-bound — at a measured-negligible quality cost (PERF.md)."""
    config: any
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype, name='encoder')
        self.decoder = Decoder(self.config, dtype=self.dtype, name='decoder')

    def __call__(self, x: jax.Array, train: bool):
        enc = self.encoder(x, train)
        x_out = self.decoder(enc.qbar if train else enc.qhard, train)
        return enc, x_out

    def encode(self, x: jax.Array, train: bool) -> EncoderOutput:
        return self.encoder(x, train)

    def decode(self, q: jax.Array, train: bool) -> jax.Array:
        return self.decoder(q, train)


def get_network_cls(config):
    return {'CVPR': CVPRAutoencoder}[config.arch]


def normalize(x: jax.Array, style: str) -> jax.Array:
    if style == 'OFF':
        return x
    if style == 'FIXED':
        return (x - _NORM_MEAN) / np.sqrt(_NORM_VAR + 1e-10)
    raise ValueError(f'Invalid normalization style {style}')


def denormalize(x: jax.Array, style: str) -> jax.Array:
    if style == 'OFF':
        return x
    if style == 'FIXED':
        return x * np.sqrt(_NORM_VAR + 1e-10) + _NORM_MEAN
    raise ValueError(f'Invalid normalization style {style}')


def get_heatmap3d(bottleneck: jax.Array) -> jax.Array:
    """(N, H, W, C+1) -> (N, H, W, C) importance-map mask in [0, 1]."""
    assert bottleneck.ndim == 4
    c_dim = bottleneck.shape[-1] - 1
    heatmap2d = jax.nn.sigmoid(bottleneck[..., 0]) * c_dim      # (N, H, W)
    c = jnp.arange(c_dim, dtype=bottleneck.dtype)               # (C,)
    return jnp.clip(heatmap2d[..., None] - c, 0.0, 1.0)


def get_centers(params) -> jax.Array:
    return params['params']['encoder']['centers']


def pad_img_to_subsampling(img_hw: Tuple[int, int]) -> Tuple[int, int]:
    f = SUBSAMPLING_FACTOR
    return (-(-img_hw[0] // f) * f, -(-img_hw[1] // f) * f)
