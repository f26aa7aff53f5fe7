import os

import numpy as np
import pytest

from imgcomp_cvpr_tpu.eval import codec_distance, compare_imgs, other_codecs


def _img(seed=0, h=128, w=128):
    rng = np.random.RandomState(seed)
    base = rng.rand(h // 8, w // 8, 3)
    img = np.kron(base, np.ones((8, 8, 1)))  # blocky, compressible
    return (img * 255).astype(np.uint8)


def test_compare_identical():
    img = _img()
    s, ms, ps = compare_imgs.compare(img, img)
    assert s == pytest.approx(1.0, abs=1e-9)
    assert ms == pytest.approx(1.0, abs=1e-9)
    assert ps == float('inf') or ps > 100


def test_jpeg_quality_monotone():
    img = _img()
    out_lo, bpp_lo = other_codecs.jp_compress(img, 10)
    out_hi, bpp_hi = other_codecs.jp_compress(img, 90)
    assert bpp_hi > bpp_lo
    _, ms_lo, _ = compare_imgs.compare(img, out_lo, calc_ssim=False)
    _, ms_hi, _ = compare_imgs.compare(img, out_hi, calc_ssim=False)
    assert ms_hi > ms_lo


def test_webp_and_jp2k():
    img = _img(1)
    out, bpp = other_codecs.webp_compress(img, 50)
    assert out.shape == img.shape and bpp > 0
    out2, bpp2 = other_codecs.jp2k_compress(img, target_bpp=0.5)
    assert out2.shape == img.shape and bpp2 > 0


def test_measures_csv_roundtrip(tmp_path):
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    from PIL import Image
    for i in range(2):
        Image.fromarray(_img(i)).save(img_dir / f'im{i}.png')
    out_dir = str(tmp_path / 'out_jp')
    other_codecs.create_curves_for_images(str(img_dir), out_dir,
                                          grid=[20, 50, 80], mode='jp')
    files = other_codecs.all_measures_file_ps(out_dir)
    assert len(files) == 2
    rows = list(other_codecs.read_measures(files[0], 'ms-ssim'))
    assert len(rows) == 3
    bpps = [b for b, _ in rows]
    assert bpps == sorted(bpps)  # quality grid ascending -> bpp ascending


def test_codec_distance(tmp_path, monkeypatch):
    # Build a fake measured codec dir and point OTHER_CODECS_ROOT at it.
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    from PIL import Image
    for i in range(2):
        Image.fromarray(_img(i, 96, 96)).save(img_dir / f'im{i}.png')
    root = tmp_path / 'codecs'
    out_dir = root / codec_distance.CODECS['kodak']['jp']
    other_codecs.create_curves_for_images(
        str(img_dir), str(out_dir), grid=[10, 30, 50, 70, 90], mode='jp')

    from imgcomp_cvpr_tpu.utils import constants
    monkeypatch.setattr(constants, 'OTHER_CODECS_ROOT', str(root))
    cd = codec_distance.CodecDistance('kodak', 'jp', 'ms-ssim')
    mid_bpp = 0.5 * (cd.f_bpp_metric.x[0] + cd.f_bpp_metric.x[-1])
    d_good = cd.distance(mid_bpp, 1.0)
    d_bad = cd.distance(mid_bpp, 0.0)
    assert d_good > 0 > d_bad


def test_binary_search_hits_target():
    f = lambda q: q * q
    q = other_codecs.binary_search(f, target=9.0, lo=0, hi=10, eps=1e-4)
    assert q == pytest.approx(3.0, abs=1e-3)


def test_plotter_writes_png(tmp_path, monkeypatch):
    from imgcomp_cvpr_tpu.eval import plotter
    from imgcomp_cvpr_tpu.utils import constants
    monkeypatch.setattr(constants, 'OTHER_CODECS_ROOT', str(tmp_path / 'none'))
    out = str(tmp_path / 'plot.png')
    plotter.interpolated_curve(str(tmp_path), '', 'kodak', output_path=out,
                               paper_plot=True)
    assert os.path.getsize(out) > 1000


def test_purge_checkpoints(tmp_path):
    from imgcomp_cvpr_tpu.tools import purge_checkpoints
    from imgcomp_cvpr_tpu.utils import logdir as logdir_lib
    log_dir = logdir_lib.create_unique_log_dir(['a'], str(tmp_path / 'logs'))
    ckpt_dir = logdir_lib.ckpt_dir_for_log_dir(log_dir)
    for itr in range(1, 9):
        os.makedirs(os.path.join(ckpt_dir, f'ckpt-{itr * 100}'))
    purge_checkpoints.purge_checkpoints(str(tmp_path / 'logs'),
                                        str(tmp_path / 'archive'))
    left = sorted(os.listdir(ckpt_dir))
    assert left == ['ckpt-200', 'ckpt-500', 'ckpt-800']
    assert os.path.isdir(str(tmp_path / 'archive'))


def test_full_analysis_path(tmp_path, monkeypatch):
    """other_codecs curves -> codec_distance -> plotter with an 'Ours' run
    (the reference's offline analysis path, SURVEY.md §3.5)."""
    from PIL import Image
    from imgcomp_cvpr_tpu.eval import plotter, val_files
    from imgcomp_cvpr_tpu.utils import constants, logdir as logdir_lib

    # 1. measured JPEG curves for the 'kodak' dataset slot
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray(_img(i, 96, 96)).save(img_dir / f'im{i}.png')
    root = tmp_path / 'codecs'
    out_dir = root / codec_distance.CODECS['kodak']['jp']
    other_codecs.create_curves_for_images(
        str(img_dir), str(out_dir), grid=[10, 30, 50, 70, 90], mode='jp')
    monkeypatch.setattr(constants, 'OTHER_CODECS_ROOT', str(root))

    # 2. an "Ours" run: log dir + measures.csv in the reference format
    log_root = tmp_path / 'logs'
    log_dir = logdir_lib.create_unique_log_dir(['cvpr/low', 'cvpr/res_shallow'],
                                               str(log_root))
    ckpt_dir = logdir_lib.ckpt_dir_for_log_dir(log_dir)
    os.makedirs(ckpt_dir)
    vd = val_files.ValidationDirs(ckpt_dir, str(log_root), 'kodak')
    mw = val_files.MeasuresWriter(vd.out_dir)
    for name, bpp, ms, ps in [('im0.png', 0.3, 0.95, 28.0),
                              ('im1.png', 0.5, 0.97, 30.0)]:
        mw.append(name, {'bpp': bpp, 'ms-ssim': ms, 'psnr': ps})
    mw.close()

    # 3. plot: codec curve + Ours mean + paper curve
    job_id = logdir_lib.log_date_from_log_dir(log_dir)
    out = str(tmp_path / 'rd.png')
    plotter.interpolated_curve(str(log_root), job_id, 'kodak',
                               plot_interp_of_ours=False,
                               plot_mean_of_ours=True,
                               output_path=out, paper_plot=True)
    assert os.path.getsize(out) > 1000
