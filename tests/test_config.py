import os

import pytest

from imgcomp_cvpr_tpu.utils import config as config_lib


def test_parse_cvpr_low():
    cfg, rel = config_lib.parse_spec('cvpr/low', 'ae')
    assert rel == 'cvpr/low'
    assert cfg.num_chan_bn == 32
    assert cfg.H_target == 2 * 0.2
    assert cfg.beta == 500
    assert cfg.arch == 'CVPR'
    assert cfg.distortion_to_minimize == 'ms_ssim'
    assert cfg.K_ms_ssim == 5000
    assert cfg.num_centers == 6
    assert cfg.centers_initial_range == (-2, 2)
    assert cfg.crop_size == (160, 160)
    assert cfg.batch_size == 30
    assert cfg.lr_initial == 8e-5
    assert cfg.lr_schedule == 'DECAY'
    assert cfg.arch_param_B == 5
    assert cfg.normalization == 'FIXED'
    assert cfg.regularization_factor == 0.005
    assert cfg.regularization_factor_centers == 0.1


def test_parse_cvpr_hi_and_med():
    hi, _ = config_lib.parse_spec('cvpr/hi', 'ae')
    assert hi.num_chan_bn == 64 and hi.H_target == 1.0
    med, _ = config_lib.parse_spec('cvpr/med', 'ae')
    assert med.num_chan_bn == 32 and med.H_target == 2 * 0.6


def test_parse_pc_res_shallow():
    cfg, rel = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    assert rel == 'cvpr/res_shallow'
    assert cfg.kernel_size == 3
    assert cfg.arch == 'res_shallow'
    assert cfg.arch_param__k == 24
    assert cfg.use_centers_for_padding is True
    assert cfg.regularization_factor is None
    cfg64, _ = config_lib.parse_spec('cvpr/res_shallow_64', 'pc')
    assert cfg64.arch_param__k == 64


def test_constrain_violation(tmp_path):
    p = tmp_path / 'bad'
    p.write_text('constrain x :: A, B\nx = C\n')
    with pytest.raises(config_lib.ConfigError):
        config_lib.parse(str(p))


def test_use_inheritance_and_override(tmp_path):
    (tmp_path / 'parent').write_text('a = 1\nb = 2\n')
    (tmp_path / 'child').write_text('use parent\nb = 3*a\nc = (1, 2)\n')
    cfg, _ = config_lib.parse(str(tmp_path / 'child'))
    assert cfg.a == 1 and cfg.b == 3 and cfg.c == (1, 2)


def test_reference_configs_parse_verbatim():
    """The DSL loader must parse the reference's own config files unchanged."""
    ref = '/root/reference/code'
    if not os.path.isdir(ref):
        pytest.skip('reference not mounted')
    cfg, _ = config_lib.parse(os.path.join(ref, 'ae_configs/cvpr/low'),
                              base_dir=os.path.join(ref, 'ae_configs'))
    ours, _ = config_lib.parse_spec('cvpr/low', 'ae')
    for key in ('num_chan_bn', 'H_target', 'beta', 'num_centers', 'crop_size',
                'batch_size', 'lr_initial', 'arch_param_B', 'K_ms_ssim',
                'regularization_factor', 'regularization_factor_centers'):
        assert getattr(cfg, key) == getattr(ours, key), key
    pc_cfg, _ = config_lib.parse(os.path.join(ref, 'pc_configs/cvpr/res_shallow'),
                                 base_dir=os.path.join(ref, 'pc_configs'))
    pc_ours, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    for key in ('kernel_size', 'arch_param__k', 'use_centers_for_padding',
                'regularization_factor', 'lr_initial'):
        assert getattr(pc_cfg, key) == getattr(pc_ours, key), key


def test_replace():
    cfg, _ = config_lib.parse_spec('cvpr/low', 'ae')
    cfg2 = cfg.replace(batch_size=4)
    assert cfg2.batch_size == 4 and cfg.batch_size == 30


def test_all_reference_configs_parse():
    """Every config file shipped by the reference must parse with our DSL."""
    import glob
    ref = '/root/reference/code'
    if not os.path.isdir(ref):
        pytest.skip('reference not mounted')
    for base in ('ae_configs', 'pc_configs'):
        root = os.path.join(ref, base)
        files = [p for p in glob.glob(os.path.join(root, '**', '*'), recursive=True)
                 if os.path.isfile(p)]
        assert files
        for p in files:
            cfg, rel = config_lib.parse(p, base_dir=root)
            assert len(list(cfg.keys())) > 0, p
