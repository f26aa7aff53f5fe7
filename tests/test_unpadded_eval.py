"""Unpadded-frame validation metrics (VERDICT r2 #5) + shape-bucketed
batching (VERDICT r2 #6): metrics/saved outputs must ignore pad rows, and
shape-interleaved datasets must still form full eval batches."""

import jax
import numpy as np

from imgcomp_cvpr_tpu.data import images_iterator as ii_lib
from imgcomp_cvpr_tpu.eval import validate as validate_lib
from imgcomp_cvpr_tpu.ops import metrics as metrics_lib
from imgcomp_cvpr_tpu.utils import config as config_lib


def tiny_configs():
    ae, _ = config_lib.parse_spec('cvpr/low', 'ae')
    pc, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    ae = ae.replace(arch_param_B=1, num_chan_bn=4,
                    distortion_to_minimize='mse')
    pc = pc.replace(arch_param__k=4)
    return ae, pc


def _eval_model(h=64, w=64):
    ae_cfg, pc_cfg = tiny_configs()
    em = validate_lib.EvalModel(ae_cfg, pc_cfg)
    x0 = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32) * 255
    ae_vars = em.ae.init(jax.random.PRNGKey(0), jax.numpy.asarray(x0), False)
    pc_vars = em.pc.init(jax.random.PRNGKey(1),
                         (1, h // 8, w // 8, ae_cfg.num_chan_bn))
    em.set_params({'ae': ae_vars['params'], 'pc': pc_vars['params']},
                  ae_vars['batch_stats'])
    return em


def test_metrics_computed_on_unpadded_frame():
    rng = np.random.RandomState(1)
    oh, ow = 50, 61                       # not multiples of 8
    img = (rng.rand(oh, ow, 3) * 255).astype(np.uint8)
    padded, _undo = ii_lib.add_padding(img, 8)
    assert padded.shape == (56, 64, 3)
    hp_lo = (padded.shape[0] - oh) // 2
    wp_lo = (padded.shape[1] - ow) // 2
    pad_info = (hp_lo, wp_lo, oh, ow)

    em = _eval_model(56, 64)
    (otp,) = em.fetch_many([padded], pad_info=pad_info)

    # Output image is the unpadded frame.
    assert otp['img_out'].shape == (oh, ow, 3)
    # PSNR matches a host-side computation on the cropped frames exactly
    # (i.e. pad rows are ignored by the metric).
    inp_crop = padded[hp_lo:hp_lo + oh, wp_lo:wp_lo + ow, :]
    psnr_host = metrics_lib.psnr_np(inp_crop, otp['img_out'])
    np.testing.assert_allclose(float(otp['psnr']), psnr_host, rtol=1e-4)

    # bpp uses the real (unpadded) pixel count: the same bit total divided
    # by oh*ow instead of H*W.
    (otp_full,) = em.fetch_many([padded])  # whole-frame metrics
    bits_unpadded = float(otp['bpp']) * oh * ow
    bits_padded = float(otp_full['bpp']) * padded.shape[0] * padded.shape[1]
    np.testing.assert_allclose(bits_unpadded, bits_padded, rtol=1e-5)
    # and the whole-frame PSNR differs (pad rows included) — guards against
    # the crop being a no-op.
    assert abs(float(otp_full['psnr']) - float(otp['psnr'])) > 1e-6


def test_identical_images_give_inf_psnr_without_warning():
    import warnings
    img = np.full((16, 16, 3), 128, np.uint8)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        assert metrics_lib.psnr_np(img, img) == float('inf')


def test_tail_batches_share_one_executable():
    em = _eval_model(32, 32)
    rng = np.random.RandomState(2)
    imgs = [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(5)]
    size0 = em._fetch_fn.cache_info().currsize  # class-level cache
    em.fetch_many(imgs[:4], pad_batch_to=4)
    em.fetch_many(imgs[:2], pad_batch_to=4)   # tail: padded up to 4
    em.fetch_many(imgs[4:], pad_batch_to=4)   # single image: same exe
    assert em._fetch_fn.cache_info().currsize == size0 + 1


def test_iter_shape_buckets_interleaved():
    """A dataset alternating between two shapes must still produce full
    batches (adjacency batching would degrade to B=1)."""
    def gen():
        for i in range(8):
            shape = (32, 32, 3) if i % 2 == 0 else (16, 48, 3)
            yield f'img{i}', np.zeros(shape, np.uint8), (0, 0) + shape[:2]

    batches = list(validate_lib.iter_shape_buckets(gen(), batch_size=4))
    assert len(batches) == 2
    for names, imgs, pad_info in batches:
        assert len(imgs) == 4
        assert len({im.shape for im in imgs}) == 1


def test_iter_padded_yields_pad_geometry(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(3)
    p = tmp_path / 'img.png'
    Image.fromarray((rng.rand(30, 41, 3) * 255).astype(np.uint8)).save(p)
    it = ii_lib.ImagesIterator([str(p)], 'test')
    (name, arr, pad_info), = list(it.iter_padded(pad=8))
    assert arr.shape == (32, 48, 3)
    hp_lo, wp_lo, oh, ow = pad_info
    assert (oh, ow) == (30, 41)
    assert hp_lo == (32 - 30) // 2 and wp_lo == (48 - 41) // 2
    # iter_imgs keeps the legacy (name, img) contract
    (name2, arr2), = list(it.iter_imgs(pad=8))
    np.testing.assert_array_equal(arr, arr2)
