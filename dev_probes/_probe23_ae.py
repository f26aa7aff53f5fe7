"""Decompose the AE legs of bench.py (probe22 showed AE enc 146 ms +
AE dec 166 ms per B=64 batch vs codec 389 — the AE is now ~46% of bench
device time). Measures per-stage wall, bf16-activation variants, and a
polyphase (space-to-depth) rewrite of the transposed convs.

Usage: python dev_probes/_probe23_ae.py [B] [n_iter]
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
ae = ae_lib.get_network_cls(ae_config)(ae_config)

h, w = 512, 768
mp = B * h * w / 1e6
rng = np.random.RandomState(0)
x = jnp.asarray(bench.natural_images(rng, B, h, w))
params, batch_stats = bench.load_trained(bench.ASSET)
ae_vars = {'params': jax.device_put(params['ae']),
           'batch_stats': jax.device_put(batch_stats)}


@jax.jit
def _checksum(x):
    return jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))


def _sync(out):
    # block_until_ready through the axon client can return before the
    # execution completes (probe measured 4 queued AE encodes "blocking"
    # in 0.9 ms vs a 141 ms/batch true chain) — a scalar fetch cannot lie.
    return float(jax.device_get(_checksum(out)))


def timed(name, fn, *args, n=N_ITER):
    out = fn(*args)
    _sync(out)   # warm/compile (incl. the checksum executable)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / n
    print(f'{name:42s} {dt * 1e3:8.1f} ms/batch  ({mp / dt:6.1f} MP/s-equiv)')
    return out, dt


@jax.jit
def ae_encode(v, x):
    return ae.apply(v, x, False, method='encode').symbols


@jax.jit
def ae_decode(v, q):
    return ae.apply(v, q, False, method='decode')


syms = ae_encode(ae_vars, x)
centers = ae_vars['params']['encoder']['centers']
q = jnp.take(centers, syms)

print(f'== B={B} {h}x{w} f32 baseline ==')
timed('ae_encode (full)', ae_encode, ae_vars, x)
timed('ae_decode (full)', ae_decode, ae_vars, q)

# -- stage decomposition (f32) -------------------------------------------
enc_p = ae_vars['params']['encoder']
enc_s = ae_vars['batch_stats']['encoder']
dec_p = ae_vars['params']['decoder']
dec_s = ae_vars['batch_stats']['decoder']


def bn_relu(y, p, s, act=True):
    inv = jax.lax.rsqrt(s['var'] + 1e-5)
    y = (y - s['mean']) * (inv * p['scale']) + p['bias']
    return jax.nn.relu(y) if act else y


def slim(x, p, s, stride=1, act=True, transpose=False):
    if transpose:
        y = tf_compat.conv2d_transpose_same(x, p['w'], stride)
    else:
        y = tf_compat.conv2d_same(x, p['w'], stride)
    return bn_relu(y, p['BatchNorm_0'], s['BatchNorm_0'], act)


def res_block(x, p, s, act=True):
    y = slim(x, p['conv1'], s['conv1'], act=act)
    y = slim(y, p['conv2'], s['conv2'], act=False)
    return y + x


def enc_stem(x):
    net = ae_lib.normalize(x, ae_config.normalization)
    net = slim(net, enc_p['h1'], enc_s['h1'], stride=2)
    return slim(net, enc_p['h2'], enc_s['h2'], stride=2)


def enc_tower(net):
    r0 = net
    for b in range(ae_config.arch_param_B):
        rb = net
        for i in range(3):
            k = f'res_block_enc_{b}_{i + 1}'
            net = res_block(net, enc_p[k], enc_s[k])
        net = net + rb
    net = res_block(net, enc_p['res_block_enc_final'],
                    enc_s['res_block_enc_final'], act=False)
    return net + r0


def enc_head(net):
    return slim(net, enc_p['to_bn'], enc_s['to_bn'], stride=2, act=False)


def dec_tower(net):
    r0 = net
    for b in range(ae_config.arch_param_B):
        rb = net
        for i in range(3):
            k = f'res_block_dec_{b}_{i + 1}'
            net = res_block(net, dec_p[k], dec_s[k])
        net = net + rb
    net = res_block(net, dec_p['dec_after_res'], dec_s['dec_after_res'],
                    act=False)
    return net + r0


print('== stage decomposition (f32, separately jitted) ==')
stem, _ = timed('enc stem (h1+h2)', jax.jit(enc_stem), x)
tower, _ = timed('enc res tower (16 blocks)', jax.jit(enc_tower), stem)
timed('enc head (to_bn)', jax.jit(enc_head), tower)
fb = jax.jit(lambda q: slim(q, dec_p['from_bn'], dec_s['from_bn'],
                            stride=2, transpose=True))(q)
jax.block_until_ready(fb)
timed('dec from_bn (convT3)', jax.jit(
    lambda q: slim(q, dec_p['from_bn'], dec_s['from_bn'], stride=2,
                   transpose=True)), q)
dtw, _ = timed('dec res tower (16 blocks)', jax.jit(dec_tower), fb)
h12, _ = timed('dec h12 (convT5 128->64)', jax.jit(
    lambda t: slim(t, dec_p['h12'], dec_s['h12'], stride=2,
                   transpose=True)), dtw)
timed('dec h13 (convT5 64->3)', jax.jit(
    lambda t: slim(t, dec_p['h13'], dec_s['h13'], stride=2,
                   transpose=True)), h12)


# -- polyphase transposed conv: depth-to-space of 4 regular convs --------
def convt_poly(x, wt, stride=2):
    """conv2d_transpose_same(x, wt, 2) via polyphase decomposition:
    out[2i+di, 2j+dj] = sum_k x[i - ...] — each output phase is a regular
    VALID conv over a slice of the flipped kernel. Exact same taps; no
    lhs_dilation zeros on the MXU."""
    kh, kw, cin, cout = wt.shape
    assert stride == 2 and kh == kw
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = h_in * 2, w_in * 2
    ph_lo, _ = tf_compat.same_pad_amounts(h_out, kh, 2)
    pw_lo, _ = tf_compat.same_pad_amounts(w_out, kw, 2)
    wf = jnp.flip(wt, axis=(0, 1))
    # gradient-of-conv: y[o] = sum_t x[(o + t - (k-1-pad_lo)) / 2] * wf[t]
    # phase p = o % 2: taps t with (o + t - off) % 2 == 0 contribute.
    off_h = kh - 1 - ph_lo
    off_w = kw - 1 - pw_lo
    phases = []
    for dh in range(2):
        row = []
        for dw in range(2):
            th = [t for t in range(kh) if (dh + t - off_h) % 2 == 0]
            tw = [t for t in range(kw) if (dw + t - off_w) % 2 == 0]
            wsub = wf[jnp.asarray(th)][:, jnp.asarray(tw)]
            # output m reads input rows i = m + ih_lo .. m+ih_lo+len(th)-1
            # (consecutive th are stride-2 apart => i increments by 1).
            ih_lo = (dh + th[0] - off_h) // 2
            iw_lo = (dw + tw[0] - off_w) // 2
            Lh, Rh = max(0, -ih_lo), max(0, ih_lo + len(th) - 1)
            Lw, Rw = max(0, -iw_lo), max(0, iw_lo + len(tw) - 1)
            xi = jnp.pad(x, ((0, 0), (Lh, Rh), (Lw, Rw), (0, 0)))
            xi = xi[:, ih_lo + Lh:ih_lo + Lh + h_in + len(th) - 1,
                    iw_lo + Lw:iw_lo + Lw + w_in + len(tw) - 1]
            y = jax.lax.conv_general_dilated(
                xi, wsub, (1, 1), 'VALID',
                dimension_numbers=tf_compat._DN_2D)
            row.append(y)
        phases.append(row)
    # interleave: (B, H, W, 2, 2, C) -> (B, 2H, 2W, C)
    y = jnp.stack([jnp.stack(r, axis=3) for r in phases], axis=3)
    b = y.shape[0]
    y = y.reshape(b, h_in, w_in, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h_out, w_out, cout)


ref = tf_compat.conv2d_transpose_same(dtw, dec_p['h12']['w'], 2)
got = convt_poly(dtw, dec_p['h12']['w'])
jax.block_until_ready((ref, got))
perr = float(jnp.max(jnp.abs(ref - got)))
print(f'== polyphase convT: max|err| vs lhs_dilation = {perr:.3e} ==')
timed('h12 convT lhs_dilation (conv only)', jax.jit(
    lambda t: tf_compat.conv2d_transpose_same(t, dec_p['h12']['w'], 2)), dtw)
timed('h12 convT polyphase   (conv only)', jax.jit(
    lambda t: convt_poly(t, dec_p['h12']['w'])), dtw)
timed('h13 convT lhs_dilation (conv only)', jax.jit(
    lambda t: tf_compat.conv2d_transpose_same(t, dec_p['h13']['w'], 2)), h12)
timed('h13 convT polyphase   (conv only)', jax.jit(
    lambda t: convt_poly(t, dec_p['h13']['w'])), h12)
timed('from_bn convT lhs_dilation (conv)', jax.jit(
    lambda t: tf_compat.conv2d_transpose_same(t, dec_p['from_bn']['w'], 2)), q)
timed('from_bn convT polyphase   (conv)', jax.jit(
    lambda t: convt_poly(t, dec_p['from_bn']['w'])), q)


# -- bf16 params + activations over the hand-rolled stages ---------------
bf = jnp.bfloat16


def _cast(tree):
    return jax.tree.map(
        lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, tree)


enc_p_bf, enc_s_bf = _cast(enc_p), _cast(enc_s)
dec_p_bf, dec_s_bf = _cast(dec_p), _cast(dec_s)


def slim_t(x, p, s, stride=1, act=True, transpose=False):
    if transpose:
        y = tf_compat.conv2d_transpose_same(x, p['w'], stride)
    else:
        y = tf_compat.conv2d_same(x, p['w'], stride)
    return bn_relu(y, p['BatchNorm_0'], s['BatchNorm_0'], act)


def enc_full_bf(x):
    net = ae_lib.normalize(x, ae_config.normalization).astype(bf)
    net = slim_t(net, enc_p_bf['h1'], enc_s_bf['h1'], stride=2)
    net = slim_t(net, enc_p_bf['h2'], enc_s_bf['h2'], stride=2)
    r0 = net
    for b in range(ae_config.arch_param_B):
        rb = net
        for i in range(3):
            k = f'res_block_enc_{b}_{i + 1}'
            p, s = enc_p_bf[k], enc_s_bf[k]
            y = slim_t(net, p['conv1'], s['conv1'])
            y = slim_t(y, p['conv2'], s['conv2'], act=False)
            net = y + net
        net = net + rb
    p, s = enc_p_bf['res_block_enc_final'], enc_s_bf['res_block_enc_final']
    y = slim_t(net, p['conv1'], s['conv1'], act=False)
    y = slim_t(y, p['conv2'], s['conv2'], act=False)
    net = (y + net) + r0
    return slim_t(net, enc_p_bf['to_bn'], enc_s_bf['to_bn'], stride=2,
                  act=False)


def dec_full_bf(qv):
    net = slim_t(qv.astype(bf), dec_p_bf['from_bn'], dec_s_bf['from_bn'],
                 stride=2, transpose=True)
    r0 = net
    for b in range(ae_config.arch_param_B):
        rb = net
        for i in range(3):
            k = f'res_block_dec_{b}_{i + 1}'
            p, s = dec_p_bf[k], dec_s_bf[k]
            y = slim_t(net, p['conv1'], s['conv1'])
            y = slim_t(y, p['conv2'], s['conv2'], act=False)
            net = y + net
        net = net + rb
    p, s = dec_p_bf['dec_after_res'], dec_s_bf['dec_after_res']
    y = slim_t(net, p['conv1'], s['conv1'], act=False)
    y = slim_t(y, p['conv2'], s['conv2'], act=False)
    net = (y + net) + r0
    net = slim_t(net, dec_p_bf['h12'], dec_s_bf['h12'], stride=2,
                 transpose=True)
    net = slim_t(net, dec_p_bf['h13'], dec_s_bf['h13'], stride=2,
                 transpose=True)
    return net


print('== bf16 params+activations (hand-rolled, pre-quantizer/denorm) ==')
bn_bf, _ = timed('enc full bf16 (to bottleneck)', jax.jit(enc_full_bf), x)
out_bf, _ = timed('dec full bf16 (from q)', jax.jit(dec_full_bf), q)
# quality: symbols vs f32 symbols (nearest center on the f32 bottleneck)
centers_f = jnp.asarray(centers, jnp.float32)
syms_bf = jnp.argmin(
    jnp.abs(bn_bf.astype(jnp.float32)[..., None] - centers_f), axis=-1)
bn_f32, _ = timed('enc full f32 (stem+tower+head)',
                  jax.jit(lambda x: enc_head(enc_tower(enc_stem(x)))), x)
syms_f32 = jnp.argmin(jnp.abs(bn_f32[..., None] - centers_f), axis=-1)
match = float(jnp.mean((syms_bf == syms_f32).astype(jnp.float32)))
print(f'   bf16 bottleneck symbols match f32: {match * 100:.3f}%')
