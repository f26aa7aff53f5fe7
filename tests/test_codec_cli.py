"""tools/codec_cli.py — standalone image <-> .icz file codec.

The reference's only real-bitstream path is the val.py --real_bpp
round-trip (ref README.md:57-74 files a practical file codec under
future work); this CLI is that product feature, so the test drives the
full user path: compress a real PNG to a file, decompress it back, and
check the reconstruction equals the model's own AE round-trip."""

import struct

import jax
import numpy as np
import pytest
from PIL import Image

from imgcomp_cvpr_tpu.data.images_iterator import add_padding
from imgcomp_cvpr_tpu.models import autoencoder as ae_lib
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.tools import codec_cli
from imgcomp_cvpr_tpu.utils import config as config_lib

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
def tiny_model(tmp_path, monkeypatch):
    ae_root = tmp_path / 'cfg_ae'
    pc_root = tmp_path / 'cfg_pc'
    ae_root.mkdir()
    pc_root.mkdir()
    (ae_root / 'tiny').write_text(TINY_AE)
    (pc_root / 'tiny_pc').write_text(TINY_PC)
    monkeypatch.setenv('CONFIG_BASE_AE', str(ae_root))
    monkeypatch.setenv('CONFIG_BASE_PC', str(pc_root))
    from imgcomp_cvpr_tpu.utils import constants
    monkeypatch.setattr(constants, 'CONFIG_BASE_AE', str(ae_root))
    monkeypatch.setattr(constants, 'CONFIG_BASE_PC', str(pc_root))
    ae_config, _ = config_lib.parse_spec('tiny', 'ae')
    pc_config, _ = config_lib.parse_spec('tiny_pc', 'pc')
    ae = ae_lib.get_network_cls(ae_config)(ae_config)
    pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
    x0 = np.zeros((1, 32, 32, 3), np.float32)
    vars_ae = ae.init(jax.random.PRNGKey(0), x0, False)
    vars_pc = pc.init(jax.random.PRNGKey(1), (1, 4, 4, 4))
    params = {'ae': vars_ae['params'], 'pc': vars_pc['params']}
    return ae_config, pc_config, params, vars_ae['batch_stats']


def _save_npz(path, params, batch_stats):
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f'{prefix}/{k}', v)
        else:
            flat[prefix] = np.asarray(node)

    walk('params', params)
    walk('batch_stats', batch_stats)
    np.savez(str(path), **flat)


def test_compress_decompress_matches_ae_roundtrip(tiny_model):
    ae_config, pc_config, params, batch_stats = tiny_model
    model = codec_cli.CodecModel(ae_config, pc_config, params, batch_stats)
    rng = np.random.RandomState(0)
    img = (rng.rand(30, 38, 3) * 255).astype(np.uint8)   # non-x8: pads
    blob = model.compress(img)
    out = model.decompress(blob)
    assert out.shape == img.shape and out.dtype == np.uint8
    # oracle: AE round-trip without the entropy coder, same pad/crop
    padded, _ = add_padding(img, 8)
    syms = model._enc(model.ae_vars, padded[None])
    x = np.asarray(jax.device_get(model._dec(model.ae_vars, syms)))[0]
    hp_lo = (padded.shape[0] - 30) // 2
    wp_lo = (padded.shape[1] - 38) // 2
    np.testing.assert_array_equal(out, x[hp_lo:hp_lo + 30, wp_lo:wp_lo + 38])


def test_model_tag_mismatch_rejected(tiny_model):
    ae_config, pc_config, params, batch_stats = tiny_model
    model = codec_cli.CodecModel(ae_config, pc_config, params, batch_stats)
    img = (np.random.RandomState(1).rand(16, 16, 3) * 255).astype(np.uint8)
    blob = bytearray(model.compress(img))
    blob[8:12] = struct.pack('<I',
                             struct.unpack('<I', blob[8:12])[0] ^ 0xDEAD)
    with pytest.raises(ValueError, match='model tag mismatch'):
        model.decompress(bytes(blob))


def test_cli_main_npz_roundtrip(tiny_model, tmp_path):
    ae_config, pc_config, params, batch_stats = tiny_model
    npz = tmp_path / 'model.npz'
    _save_npz(npz, params, batch_stats)
    img = (np.random.RandomState(2).rand(24, 24, 3) * 255).astype(np.uint8)
    src = str(tmp_path / 'in.png')
    icz = str(tmp_path / 'out.icz')
    dst = str(tmp_path / 'out.png')
    Image.fromarray(img).save(src)
    codec_cli.main(['compress', src, '-o', icz, '--npz', str(npz),
                    '--ae_config', 'tiny', '--pc_config', 'tiny_pc'])
    codec_cli.main(['decompress', icz, '-o', dst, '--npz', str(npz),
                    '--ae_config', 'tiny', '--pc_config', 'tiny_pc'])
    out = np.asarray(Image.open(dst))
    assert out.shape == img.shape
    # byte-for-byte: PNG save/load of the decompressed frame is lossless
    model = codec_cli.CodecModel(ae_config, pc_config, params, batch_stats)
    np.testing.assert_array_equal(
        out, model.decompress(model.compress(img)))


def test_cli_roundtrip_mode(tiny_model, tmp_path, capsys):
    ae_config, pc_config, params, batch_stats = tiny_model
    npz = tmp_path / 'model.npz'
    _save_npz(npz, params, batch_stats)
    img = (np.random.RandomState(4).rand(24, 24, 3) * 255).astype(np.uint8)
    src = str(tmp_path / 'rt.png')
    icz = str(tmp_path / 'rt.icz')
    Image.fromarray(img).save(src)
    codec_cli.main(['roundtrip', src, '-o', icz, '--npz', str(npz),
                    '--ae_config', 'tiny', '--pc_config', 'tiny_pc'])
    out = capsys.readouterr().out
    assert 'CRC-verified' in out and 'PSNR' in out
