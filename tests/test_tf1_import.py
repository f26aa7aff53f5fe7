"""TF1 checkpoint importer round-trip: export our randomly-initialized
params under the reference's TF variable names, re-import, and check the
trees and model outputs are identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from imgcomp_cvpr_tpu.models import autoencoder as ae_lib
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.tools import tf1_import
from imgcomp_cvpr_tpu.utils import config as config_lib


def test_tf1_roundtrip(tmp_path):
    ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
    pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    ae_config = ae_config.replace(arch_param_B=1, num_chan_bn=4)
    pc_config = pc_config.replace(arch_param__k=4)

    ae = ae_lib.get_network_cls(ae_config)(ae_config)
    pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3)
                    .astype(np.float32) * 255.0)
    ae_vars = ae.init(jax.random.PRNGKey(0), x, False)
    pc_vars = pc.init(jax.random.PRNGKey(1), (1, 4, 4, ae_config.num_chan_bn))
    params = {'ae': jax.device_get(ae_vars['params']),
              'pc': jax.device_get(pc_vars['params'])}
    batch_stats = jax.device_get(ae_vars['batch_stats'])

    prefix = str(tmp_path / 'ckpt-1000')
    tf1_import.export_tf1_checkpoint(params, batch_stats, ae_config, prefix)

    params2, batch_stats2 = tf1_import.import_tf1_checkpoint(
        prefix, ae_config, pc_config)

    # tree equality
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = dict((jax.tree_util.keystr(k), v) for k, v in
                 jax.tree_util.tree_flatten_with_path(params2)[0])
    assert len(flat1) == len(flat2)
    for k, v in flat1:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat2[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))

    # identical model outputs through the imported params
    out1 = ae.apply({'params': params['ae'], 'batch_stats': batch_stats},
                    x, False)
    out2 = ae.apply({'params': params2['ae'], 'batch_stats': batch_stats2},
                    x, False)
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))

    q = out1[0].qhard
    syms = out1[0].symbols
    centers = params['ae']['encoder']['centers']
    bc1 = pc.bitcost({'params': params['pc']}, q, syms, pad_value=centers[0])
    bc2 = pc.bitcost({'params': params2['pc']}, q, syms, pad_value=centers[0])
    np.testing.assert_array_equal(np.asarray(bc1), np.asarray(bc2))


def test_parity_harness_end_to_end(tmp_path):
    """The one-command parity harness (tools/parity_check.py) on a synthetic
    TF1 checkpoint: export a random-init tiny model under the reference's
    variable names, write a few PNGs, run the harness, and check it PASSes
    against its own measured numbers and FAILs against off-budget ones."""
    from PIL import Image

    from imgcomp_cvpr_tpu.tools import parity_check

    ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
    pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    ae_config = ae_config.replace(arch_param_B=1, num_chan_bn=4)
    pc_config = pc_config.replace(arch_param__k=4)

    ae = ae_lib.get_network_cls(ae_config)(ae_config)
    pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3)
                    .astype(np.float32) * 255.0)
    ae_vars = ae.init(jax.random.PRNGKey(0), x, False)
    pc_vars = pc.init(jax.random.PRNGKey(1), (1, 4, 4, ae_config.num_chan_bn))
    params = {'ae': jax.device_get(ae_vars['params']),
              'pc': jax.device_get(pc_vars['params'])}
    batch_stats = jax.device_get(ae_vars['batch_stats'])
    prefix = str(tmp_path / '0515_9999' / 'ckpt-1')
    (tmp_path / '0515_9999').mkdir()
    tf1_import.export_tf1_checkpoint(params, batch_stats, ae_config, prefix)

    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(3):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            img_dir / f'im{i}.png')

    # custom configs: pass spec-less via temp config files is overkill —
    # run_parity takes specs; monkeypatch parse to return the tiny configs.
    import imgcomp_cvpr_tpu.utils.config as config_mod
    orig = config_mod.parse_spec

    def fake_parse(spec, kind):
        return (ae_config, None) if kind == 'ae' else (pc_config, None)

    config_mod.parse_spec = fake_parse
    try:
        ok, bpp, msssim = parity_check.run_parity(
            prefix, 'tiny', 'tiny', str(img_dir))
        assert ok  # no expectations given -> vacuous pass, numbers returned
        ok2, _, _ = parity_check.run_parity(
            prefix, 'tiny', 'tiny', str(img_dir),
            expected_bpp=bpp, expected_msssim=msssim)
        assert ok2
        ok3, _, _ = parity_check.run_parity(
            prefix, 'tiny', 'tiny', str(img_dir),
            expected_bpp=bpp * 1.2, expected_msssim=msssim)
        assert not ok3
    finally:
        config_mod.parse_spec = orig


def _expected_tf1_inventory(ae_config, pc_config):
    """The COMPLETE {tf1_var_name: shape} inventory of a released reference
    checkpoint's model variables, derived independently from the reference
    source (NOT via tf1_import's own tables — that's the point):

    - every slim conv in _encode/_decode runs inside _batch_norm_scope, so
      it carries BatchNorm {gamma, beta, moving_mean, moving_variance} over
      its output channels and NO biases (ref autoencoder.py:206-233 within
      :106-125's arg_scope; 'scale': True at :118 keeps gamma).
    - conv2d weights are [kh,kw,in,out]; conv2d_transpose weights are
      [kh,kw,out,in] (TF convention).
    - residual_block -> scope/conv{1,2} (ref autoencoder.py:279-287);
      encoder blocks nest as res_block_enc_{b}/enc_{b}_{i} (ref :224-228),
      the final one is unnested (ref :231).
    - to_bn outputs num_chan_bn + 1 heatmap channel (ref :236-238);
      the decoder input has the heatmap channel masked away (ref :197-199).
    - centers: autoencoder/encoder/centers, shape (L,) (ref quantizer.py:11-15
      created inside the encoder scope, autoencoder.py:52-54).
    - probclass: probclass3d/logits/... conv3d_<name>_mask/{weights,biases},
      weights (K//2+1, K, K, in, out) (ref probclass.py:28,85,213-220,
      236-261); the top-level output conv is NAMED 'conv2' (ref :220), the
      residual block nests res1/conv{1,2} (ref :185-195).
    """
    n = 128                                   # arch_param_n (ref :211)
    B = ae_config.arch_param_B
    Cq = ae_config.num_chan_bn                # decoder input channels
    Cb = Cq + (1 if ae_config.heatmap else 0)  # to_bn output channels
    L = ae_config.num_centers
    inv = {'autoencoder/encoder/centers': (L,)}

    def bn_conv(scope, shape, nout):
        inv[f'{scope}/weights'] = shape
        for v in ('gamma', 'beta', 'moving_mean', 'moving_variance'):
            inv[f'{scope}/BatchNorm/{v}'] = (nout,)

    e = 'autoencoder/encoder'
    bn_conv(f'{e}/h1', (5, 5, 3, n // 2), n // 2)
    bn_conv(f'{e}/h2', (5, 5, n // 2, n), n)
    for b in range(B):
        for i in (1, 2, 3):
            for j in (1, 2):
                bn_conv(f'{e}/res_block_enc_{b}/enc_{b}_{i}/conv{j}',
                        (3, 3, n, n), n)
    for j in (1, 2):
        bn_conv(f'{e}/res_block_enc_final/conv{j}', (3, 3, n, n), n)
    bn_conv(f'{e}/to_bn', (5, 5, n, Cb), Cb)

    d = 'autoencoder/decoder'
    bn_conv(f'{d}/from_bn', (3, 3, n, Cq), n)        # transpose: [kh,kw,out,in]
    for b in range(B):
        for i in (1, 2, 3):
            for j in (1, 2):
                bn_conv(f'{d}/res_block_dec_{b}/dec_{b}_{i}/conv{j}',
                        (3, 3, n, n), n)
    for j in (1, 2):
        bn_conv(f'{d}/dec_after_res/conv{j}', (3, 3, n, n), n)
    bn_conv(f'{d}/h12', (5, 5, n // 2, n), n // 2)   # transpose
    bn_conv(f'{d}/h13', (5, 5, 3, n // 2), 3)        # transpose

    K, k = pc_config.kernel_size, pc_config.arch_param__k
    kd = K // 2 + 1
    p = 'probclass3d/logits'
    inv[f'{p}/conv3d_conv0_mask/weights'] = (kd, K, K, 1, k)
    inv[f'{p}/conv3d_conv0_mask/biases'] = (k,)
    inv[f'{p}/res1/conv3d_conv1_mask/weights'] = (kd, K, K, k, k)
    inv[f'{p}/res1/conv3d_conv1_mask/biases'] = (k,)
    inv[f'{p}/res1/conv3d_conv2_mask/weights'] = (kd, K, K, k, k)
    inv[f'{p}/res1/conv3d_conv2_mask/biases'] = (k,)
    inv[f'{p}/conv3d_conv2_mask/weights'] = (kd, K, K, k, L)
    inv[f'{p}/conv3d_conv2_mask/biases'] = (L,)
    return inv


@pytest.mark.parametrize('spec', ['cvpr/low', 'cvpr/med', 'cvpr/hi'])
def test_tf1_name_inventory(spec):
    """The mapper consumes EXACTLY the released checkpoints' variable set,
    at the right shapes, for all three published configs (A/B/C,
    ref README.md:47-49) — so parity is one command the day the real
    checkpoints are available (VERDICT r3 #5)."""
    ae_config, _ = config_lib.parse_spec(spec, 'ae')
    pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    expected = _expected_tf1_inventory(ae_config, pc_config)

    ae = ae_lib.get_network_cls(ae_config)(ae_config)
    pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ae_vars = ae.init(jax.random.PRNGKey(0), x, False)
    pc_vars = pc.init(jax.random.PRNGKey(1),
                      (1, 4, 4, ae_config.num_chan_bn))
    params = {'ae': jax.device_get(ae_vars['params']),
              'pc': jax.device_get(pc_vars['params'])}
    batch_stats = jax.device_get(ae_vars['batch_stats'])

    tensors = tf1_import.export_tensors(params, batch_stats, ae_config)

    missing = sorted(set(expected) - set(tensors))
    extra = sorted(set(tensors) - set(expected))
    assert not missing, f'mapper does not consume/produce: {missing[:8]}'
    assert not extra, f'mapper invents variables the ckpt lacks: {extra[:8]}'
    for name, shape in expected.items():
        assert tuple(tensors[name].shape) == shape, (
            name, tensors[name].shape, shape)


def test_parity_manifest_only(tmp_path, capsys):
    """parity_check --manifest-only: a var_names.pkl (ref saver.py:19-43)
    with no tensor values validates the importer mapping — complete
    manifests pass, a missing model variable or an unmapped one fails."""
    from imgcomp_cvpr_tpu.tools import parity_check

    ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
    names = [n + ':0' for n in tf1_import.expected_names(ae_config)]
    # training state the reference's checkpoints also carry — skipped
    names += ['autoencoder/encoder/h1/weights/Adam:0',
              'autoencoder/encoder/h1/weights/Adam_1:0',
              'beta1_power:0', 'beta2_power:0', 'global_step:0']

    import pickle
    ok_pkl = tmp_path / 'var_names.pkl'
    ok_pkl.write_bytes(pickle.dumps(names))
    rc = parity_check.main(['--manifest-only', str(ok_pkl),
                            '--ae', 'cvpr/low', '--pc', 'cvpr/res_shallow'])
    assert rc == 0
    assert 'OK' in capsys.readouterr().out

    # job-id auto-detection from the manifest path
    job_pkl = tmp_path / '0515_1103' / 'var_names.pkl'
    job_pkl.parent.mkdir()
    job_pkl.write_bytes(pickle.dumps(names))
    assert parity_check.main(['--manifest-only', str(job_pkl)]) == 0

    # a model variable missing from the manifest fails
    bad = [n for n in names if not n.startswith('probclass3d/logits/conv3d_'
                                                'conv0_mask/weights')]
    bad_pkl = tmp_path / 'missing.pkl'
    bad_pkl.write_bytes(pickle.dumps(bad))
    rc = parity_check.main(['--manifest-only', str(bad_pkl),
                            '--ae', 'cvpr/low', '--pc', 'cvpr/res_shallow'])
    assert rc == 1
    assert 'MISSING' in capsys.readouterr().out

    # an unexplained (non-training-state) manifest variable fails too
    extra_pkl = tmp_path / 'extra.pkl'
    extra_pkl.write_bytes(pickle.dumps(names + ['autoencoder/mystery:0']))
    rc = parity_check.main(['--manifest-only', str(extra_pkl),
                            '--ae', 'cvpr/low', '--pc', 'cvpr/res_shallow'])
    assert rc == 1
    assert 'UNMAPPED' in capsys.readouterr().out

    # .txt name lists (ref saver.save_vars writes those too) parse as well
    txt = tmp_path / 'var_names.txt'
    txt.write_text('\n'.join(names))
    assert parity_check.main(['--manifest-only', str(txt),
                              '--ae', 'cvpr/low',
                              '--pc', 'cvpr/res_shallow']) == 0
