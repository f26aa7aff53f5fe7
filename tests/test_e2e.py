"""End-to-end: train a tiny model for a few steps (data-parallel over the
8-device CPU mesh), then run the full validation path — config recovery
from the log-dir name, checkpoint restore, measures.csv."""

import os

import numpy as np
import pytest

TINY_AE = """
num_chan_bn = 4
regularization_factor = 0.005
constrain normalization :: OFF, FIXED
normalization = FIXED
heatmap = True
beta = 500
train_autoencoder = True
train_probclass = True
arch = 'CVPR'
constrain distortion_to_minimize :: mse, psnr, ms_ssim
distortion_to_minimize = mse
K_psnr = 100
K_ms_ssim = 5000
centers_initial_range = (-2, 2)
num_centers = 6
regularization_factor_centers = 0.1
H_target = 0.4
crop_size = (32, 32)
batch_size = 2
lr_initial = 8e-5
lr_centers_factor = None
constrain optimizer :: ADAM, MOMENTUM, SGD
optimizer = ADAM
optimizer_momentum = 0.9
constrain lr_schedule :: FIXED, DECAY
lr_schedule = FIXED
lr_schedule_decay_interval = 2
lr_schedule_decay_rate = 0.1
lr_schedule_decay_staircase = True
arch_param_B = 1
"""

TINY_PC = """
arch = 'res_shallow'
kernel_size = 3
lr_initial = 1e-4
constrain optimizer :: ADAM, MOMENTUM, SGD
optimizer = ADAM
optimizer_momentum = 0.9
constrain lr_schedule :: FIXED, DECAY
lr_schedule = FIXED
lr_schedule_decay_interval = 2
lr_schedule_decay_rate = 0.1
lr_schedule_decay_staircase = True
arch_param__k = 4
arch_param__non_linearity = 'relu'
arch_param__fc = 64
regularization_factor = None
learn_pad_var = False
use_centers_for_padding = True
"""


@pytest.fixture
def config_roots(tmp_path, monkeypatch):
    ae_root = tmp_path / 'cfg_ae'
    pc_root = tmp_path / 'cfg_pc'
    ae_root.mkdir()
    pc_root.mkdir()
    (ae_root / 'tiny').write_text(TINY_AE)
    (pc_root / 'tiny_pc').write_text(TINY_PC)
    monkeypatch.setenv('CONFIG_BASE_AE', str(ae_root))
    monkeypatch.setenv('CONFIG_BASE_PC', str(pc_root))
    # constants caches env at import; patch the module values too.
    from imgcomp_cvpr_tpu.utils import constants
    monkeypatch.setattr(constants, 'CONFIG_BASE_AE', str(ae_root))
    monkeypatch.setattr(constants, 'CONFIG_BASE_PC', str(pc_root))
    return str(ae_root), str(pc_root)


def test_train_then_validate(tmp_path, config_roots):
    from imgcomp_cvpr_tpu.data.images_iterator import ImagesIterator
    from imgcomp_cvpr_tpu.eval import validate as validate_lib
    from imgcomp_cvpr_tpu.eval.val_files import MeasuresReader, ValidationDirs
    from imgcomp_cvpr_tpu.training import train_loop
    from imgcomp_cvpr_tpu.utils import logdir as logdir_lib

    log_root = str(tmp_path / 'logs')
    flags = train_loop.TrainFlags(log_interval_train=2, log_interval_test=-1,
                                  log_interval_save=2, max_steps=3)
    log_dir = train_loop.train('tiny', 'tiny_pc',
                               dataset_train='synthetic:4',
                               dataset_test='synthetic:2',
                               log_dir_root=log_root, flags=flags,
                               description='e2e test')
    assert os.path.isdir(log_dir)
    ckpt_dir = logdir_lib.ckpt_dir_for_log_dir(log_dir)
    assert os.path.isdir(ckpt_dir)

    # two tiny val "PNGs" (sizes not multiples of 8 -> exercises padding)
    from PIL import Image
    val_dir = tmp_path / 'val_imgs'
    val_dir.mkdir()
    rng = np.random.RandomState(0)
    for i, hw in enumerate([(30, 38), (30, 38)]):
        Image.fromarray((rng.rand(*hw, 3) * 255).astype(np.uint8)).save(
            val_dir / f'img{i}.png')

    it = ImagesIterator([str(val_dir / 'img0.png'), str(val_dir / 'img1.png')],
                        'valset', cache_max_mb=10)
    vd = ValidationDirs(ckpt_dir, log_root, 'valset')
    validate_lib.validate(vd, it, validate_lib.OutputFlags(save_ours=True))

    rows = list(MeasuresReader(vd.out_dir).iter_metric('ms-ssim'))
    assert len(rows) == 2
    for name, bpp, msssim in rows:
        assert bpp > 0 and 0 <= msssim <= 1
    # idempotency: second call skips
    validate_lib.validate(vd, it, validate_lib.OutputFlags())
    # saved output images exist
    assert os.path.isfile(os.path.join(vd.out_dir, 'imgs', 'img0.png'))

    # --real_bpp: whole-bucket batched entropy roundtrip (bit-exactness
    # asserted inside validate); fresh ValidationDirs so the ckpt is not
    # already marked validated
    vd_rb = ValidationDirs(ckpt_dir, log_root, 'valset_rb')
    validate_lib.validate(vd_rb, it, validate_lib.OutputFlags(real_bpp=True))
    rows_rb = list(MeasuresReader(vd_rb.out_dir).iter_metric('ms-ssim'))
    assert len(rows_rb) == 2
