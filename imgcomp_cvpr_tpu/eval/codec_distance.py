"""Distance of an (bpp, metric) operating point to a baseline codec's R-D
curve on a dataset (ref: codec_distance.py:50-109). Used as the ``d_BPG``
training monitor and in validation summaries.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Iterable, List, Tuple

import numpy as np
import scipy.interpolate

from ..utils import constants
from ..utils import logdir as logdir_lib
from . import other_codecs, val_files

_REQUIRED_BINS = 0.99
DEFAULT_BPP_GRID = np.linspace(0.1, 1.4, 50)

# dataset -> codec -> measures dir under $OTHER_CODECS_ROOT
# (ref: codec_distance.py:25-42)
CODECS = {
    'testset': {'bpg': 'out_bpg_imagenet_256_train_val_128x128__100',
                'jp': 'out_jp_imagenet_256_train_val_128x128__100'},
    'kodak': {'bpg': 'out_bpg_kodak_v2',
              'jp2k': 'out_jp2k_Kodak',
              'jp': 'out_jp_Kodak',
              'webp': 'out_webp_kodak'},
}


class CodecDistanceReadException(Exception):
    pass


class CodecDistance:
    def __init__(self, dataset: str, codec: str, metric: str):
        assert metric in other_codecs.SUPPORTED_METRICS, metric
        if dataset not in CODECS:
            raise CodecDistanceReadException(f'Dataset {dataset} not in {list(CODECS)}')
        if codec not in CODECS[dataset]:
            raise CodecDistanceReadException(f'Codec {codec} not in {list(CODECS[dataset])}')
        codec_dir = os.path.join(constants.OTHER_CODECS_ROOT, CODECS[dataset][codec])
        try:
            bpps, values = get_interpolated_values(codec_dir, DEFAULT_BPP_GRID, metric)
        except (ValueError, CodecDistanceReadException) as e:
            raise CodecDistanceReadException(f'Failed: {e}')
        self.f_bpp_metric = scipy.interpolate.interp1d(bpps, values, 'linear')

    def distance(self, bpp: float, value: float) -> float:
        """> 0 if (bpp, value) is better than the codec at that bpp."""
        return float(value - self.f_bpp_metric(bpp))


def interpolator(measures_per_image_iter: Iterable, grid: np.ndarray,
                 interp_mode: str = 'linear') -> Tuple[List[float], List[float]]:
    """Average each image's R-D curve over a bpp grid; bins covered by fewer
    than _REQUIRED_BINS of the images are dropped (ref:
    codec_distance.py:70-100)."""
    accumulated = np.zeros_like(grid, np.float64)
    counts = np.zeros_like(grid, np.int64)
    num_imgs = 0
    for img_description, (bpps, values) in measures_per_image_iter:
        assert len(bpps) >= 2, f'Missing values for {img_description}'
        num_imgs += 1
        fq = scipy.interpolate.interp1d(bpps, values, interp_mode)
        for i, bpp in enumerate(grid):
            try:
                accumulated[i] += fq(bpp)
                counts[i] += 1
            except ValueError:
                continue
    pairs = [(bpp, acc / n) for bpp, acc, n in zip(grid, accumulated, counts)
             if n > _REQUIRED_BINS * num_imgs]
    if not pairs:
        raise ValueError('No bins sufficiently covered')
    out_grid, out_values = zip(*pairs)
    return list(out_grid), list(out_values)


def get_interpolated_values(codec_dir: str, grid: np.ndarray, metric: str):
    ps = other_codecs.all_measures_file_ps(codec_dir)
    if len(ps) == 0:
        raise CodecDistanceReadException(f'No matches in {codec_dir}')
    it = ((p, _unzip(sorted(other_codecs.read_measures(p, metric), reverse=True)))
          for p in ps)
    return interpolator(it, grid, interp_mode='linear')


def get_measures_readers(log_dir_root: str, job_ids: str, dataset: str):
    measures_readers = []
    missing = []
    for job_id, ckpt_dir in zip(job_ids.split(','),
                                logdir_lib.iter_ckpt_dirs(log_dir_root, job_ids)):
        vd = val_files.ValidationDirs(ckpt_dir, log_dir_root, dataset)
        try:
            measures_readers.append(val_files.MeasuresReader(vd.out_dir))
        except FileNotFoundError:
            missing.append(job_id)
    if missing:
        print('Missing measures files for:\n{}'.format(','.join(missing)))
    return [val_files.MeasuresReader(o) for o in {m.out_dir for m in measures_readers}]


def interpolate_ours(measures_readers, grid, interp_mode: str, metric: str):
    measures_per_image = defaultdict(list)
    for mr in measures_readers:
        for img_name, bpp, value in mr.iter_metric(metric):
            measures_per_image[img_name].append((bpp, value))
    for img_name, values in measures_per_image.items():
        assert len(values) == len(measures_readers), (img_name, len(values))
    return interpolator(
        ((img_name, _unzip(sorted(bv, reverse=True)))
         for img_name, bv in measures_per_image.items()),
        grid, interp_mode)


def _unzip(pairs):
    a, b = zip(*pairs)
    return list(a), list(b)
