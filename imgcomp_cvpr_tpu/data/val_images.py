"""Validation dataset-name resolution (ref: val_images.py:6-44)."""

from __future__ import annotations

from glob import glob
from os import path
from typing import List, Tuple

from ..utils import constants

KNOWN_DATASETS = {
    'kodak': path.join(constants.VALIDATION_DATASETS_ROOT, 'kodak', '*.png'),
    'testset': path.join(constants.VALIDATION_DATASETS_ROOT,
                         'imagenet_256_train_val_128x128__100', '*.png'),
}


def get_image_paths(images: str) -> Tuple[List[str], str]:
    """images: a KNOWN_DATASETS key, a dir of PNGs, or a glob.
    Returns (sorted image paths, dataset short name)."""
    images_glob, dataset_name = _get_glob_and_name(images)
    image_paths = sorted(glob(images_glob))
    if len(image_paths) == 0:
        raise ValueError(f'Not matching any files: {images_glob}')
    return image_paths, dataset_name


def _get_glob_and_name(images: str) -> Tuple[str, str]:
    if images in KNOWN_DATASETS:
        return KNOWN_DATASETS[images], images
    if '*' not in images:
        images = path.join(images, '*.png')
    return images, get_path_component_before_glob(images)


def get_path_component_before_glob(p: str) -> str:
    for comp in reversed(p.strip(path.sep).split(path.sep)):
        if '*' not in comp:
            return comp
    raise ValueError(f'No component without *: {p}')
