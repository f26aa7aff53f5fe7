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
