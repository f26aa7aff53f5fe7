"""Probe: can eval-time BatchNorm folding close the AE tower's roofline
gap? probe23/24 measured the 16-block res towers at ~117 ms/leg f32 and
~105 bf16 per B=64 batch — ~3x above the bf16 roofline (compute ~34 ms,
HBM ~33 ms). At eval BN is an affine transform, so it folds into the
conv weights exactly: W' = W * (scale * rsqrt(var+eps)) per out-channel,
b' = bias - mean * that. If the measured gap is unfused BN/elementwise
passes, the folded tower should approach the roofline.

Usage: python dev_probes/_probe26_bnfold.py [B] [n_iter]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import bench
from imgcomp_cvpr_tpu.models import autoencoder as ae_lib
from imgcomp_cvpr_tpu.ops import tf_compat
from imgcomp_cvpr_tpu.utils import config as config_lib

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 4

ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
h, w = 512, 768
mp = B * h * w / 1e6
rng = np.random.RandomState(0)
params, batch_stats = bench.load_trained(bench.ASSET)
enc_p = params['ae']['encoder']
enc_s = batch_stats['encoder']


@jax.jit
def _checksum(x):
    return jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))


def _sync(out):
    return float(jax.device_get(_checksum(out)))


def timed(name, fn, *args, n=N_ITER):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / n
    print(f'{name:46s} {dt * 1e3:8.1f} ms/batch  ({mp / dt:6.1f} MP/s-eq)',
          flush=True)
    return out, dt


# Tower input: the real stem activation shape (B, 128, 192, 128ch).
x0 = jnp.asarray(rng.rand(B, h // 4, w // 4, 128).astype(np.float32))
x0b = x0.astype(jnp.bfloat16)


def bn_relu(y, p, s, act=True):
    inv = jax.lax.rsqrt(s['var'] + 1e-5)
    y = (y - s['mean']) * (inv * p['scale']) + p['bias']
    return jax.nn.relu(y) if act else y


def tower(net, dt, fold):
    """The encoder res tower with dtype dt; fold=True bakes BN into W."""
    def slim(x, p, s, act=True):
        w_ = p['w'].astype(jnp.float32)
        if fold:
            sc = (p['scale'] * jax.lax.rsqrt(p['var'] + 1e-5))
            b_ = p['bias'] - p['mean'] * sc
            y = tf_compat.conv2d_same(x.astype(dt),
                                      (w_ * sc).astype(dt), 1)
            y = y + b_.astype(y.dtype)
        else:
            y = tf_compat.conv2d_same(x.astype(dt), w_.astype(dt), 1)
            y = bn_relu(y, p, s, act=False)
        return jax.nn.relu(y) if act else y

    def res_block(x, p, s, act=True):
        y = slim(x, p['conv1'],
                 None if fold else s['conv1'], act=act)
        y = slim(y, p['conv2'],
                 None if fold else s['conv2'], act=False)
        return y + x.astype(y.dtype)

    def fp(p, s):   # fold BN params INTO the conv param dict view
        return {'w': p['w'], 'scale': p['BatchNorm_0']['scale'],
                'bias': p['BatchNorm_0']['bias'],
                'var': s['BatchNorm_0']['var'],
                'mean': s['BatchNorm_0']['mean']}

    r0 = net
    for b in range(ae_config.arch_param_B):
        rb = net
        for i in range(3):
            k = f'res_block_enc_{b}_{i + 1}'
            if fold:
                p = {'conv1': {**fp(enc_p[k]['conv1'], enc_s[k]['conv1'])},
                     'conv2': {**fp(enc_p[k]['conv2'], enc_s[k]['conv2'])}}
                net = res_block(net, p, None)
            else:
                net = res_block(
                    net,
                    {'conv1': {'w': enc_p[k]['conv1']['w'],
                               **enc_p[k]['conv1']['BatchNorm_0']},
                     'conv2': {'w': enc_p[k]['conv2']['w'],
                               **enc_p[k]['conv2']['BatchNorm_0']}},
                    {'conv1': enc_s[k]['conv1']['BatchNorm_0'],
                     'conv2': enc_s[k]['conv2']['BatchNorm_0']})
        net = net + rb
    k = 'res_block_enc_final'
    if fold:
        p = {'conv1': {**fp(enc_p[k]['conv1'], enc_s[k]['conv1'])},
             'conv2': {**fp(enc_p[k]['conv2'], enc_s[k]['conv2'])}}
        net = res_block(net, p, None, act=False)
    else:
        net = res_block(
            net,
            {'conv1': {'w': enc_p[k]['conv1']['w'],
                       **enc_p[k]['conv1']['BatchNorm_0']},
             'conv2': {'w': enc_p[k]['conv2']['w'],
                       **enc_p[k]['conv2']['BatchNorm_0']}},
            {'conv1': enc_s[k]['conv1']['BatchNorm_0'],
             'conv2': enc_s[k]['conv2']['BatchNorm_0']}, act=False)
    return net + r0


print(f'== B={B} tower probe (input {tuple(x0.shape)}) ==', flush=True)
o_f32, _ = timed('tower f32 BN', jax.jit(lambda v: tower(v, jnp.float32,
                                                         False)), x0)
o_b16, _ = timed('tower bf16 BN', jax.jit(lambda v: tower(v, jnp.bfloat16,
                                                          False)), x0)
o_fold32, _ = timed('tower f32 BN-FOLDED', jax.jit(
    lambda v: tower(v, jnp.float32, True)), x0)
o_fold, _ = timed('tower bf16 BN-FOLDED', jax.jit(
    lambda v: tower(v, jnp.bfloat16, True)), x0)

# numeric sanity: folded vs unfolded should agree to dtype noise
d32 = float(jnp.max(jnp.abs(o_f32 - o_fold32)))
a32 = float(jnp.max(jnp.abs(o_f32)))
print(f'fold-vs-BN f32 max|diff| {d32:.3e} (max|act| {a32:.3e})')
d16 = float(jnp.max(jnp.abs(o_b16.astype(jnp.float32)
                            - o_fold.astype(jnp.float32))))
print(f'fold-vs-BN bf16 max|diff| {d16:.3e}')
