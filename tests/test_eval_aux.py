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
    mid_bpp = 0.5 * (cd._grid[0] + cd._grid[-1])
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


def test_bpg_header_parser():
    """Crafted BPG header: ue7 varints for width/height/picture length
    (behavioral port of ref other_codecs.py:422-463)."""
    def ue7(v):
        out = []
        while True:
            out.append(v & 0x7F)
            v >>= 7
            if not v:
                break
        return bytes(b | 0x80 for b in out[:0:-1]) + bytes(out[:1])

    assert ue7(1218) == bytes([0b10001001, 0b01000010])  # ref docstring example
    payload = b'\x42' * 321
    data = (other_codecs.BPGInfo.MAGIC + b'\x00\x00'
            + ue7(768) + ue7(512) + ue7(321) + payload + b'trailer-ignored')
    info = other_codecs.BPGInfo(data)
    assert (info.width, info.height, info.picture_bytes) == (768, 512, 321)
    assert abs(info.bpp - 321 * 8 / (768 * 512)) < 1e-9
    # zero picture length => picture runs to EOF
    data2 = (other_codecs.BPGInfo.MAGIC + b'\x00\x00'
             + ue7(16) + ue7(16) + ue7(0) + b'\x01' * 77)
    assert other_codecs.BPGInfo(data2).picture_bytes == 77
    try:
        other_codecs.BPGInfo(b'NOPE' + data[4:])
    except ValueError:
        pass
    else:
        raise AssertionError('bad magic accepted')


def test_jpeg_content_length():
    import io
    from PIL import Image
    img = _img(3, 64, 64)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, 'JPEG', quality=80)
    data = buf.getvalue()
    n = other_codecs.jpeg_content_length(data)
    assert 0 < n < len(data)
    assert data.rstrip(b'\x00')[-2:] == b'\xff\xd9'
    # bpp used by jp_compress must match the scan
    out, bpp = other_codecs.jp_compress(img, 80)
    assert abs(bpp - n * 8 / (64 * 64)) < 1e-9
