#!/usr/bin/env python
"""Validation entry point (CLI mirrors the reference's val.py:265-302)."""

import argparse

from imgcomp_cvpr_tpu.data import val_images
from imgcomp_cvpr_tpu.data.images_iterator import ImagesIterator
from imgcomp_cvpr_tpu.eval import validate as validate_lib
from imgcomp_cvpr_tpu.eval.val_files import ValidationDirs
from imgcomp_cvpr_tpu.utils import logdir as logdir_lib


def main():
    p = argparse.ArgumentParser()
    p.add_argument('log_dir_root', help='Path to dir containing log_dirs.')
    p.add_argument('job_ids', help='Comma-separated list of job_ids.')
    p.add_argument('images', help='Known dataset name, dir of PNGs, or glob.')
    p.add_argument('--save_ours', '-o', action='store_true',
                   help='Store output images in VAL_OUT/imgs.')
    p.add_argument('--how_many', type=int, help='Number of images to validate.')
    p.add_argument('--image_cache_max', '-cache', type=int, default=500,
                   help='Cache max in MB; 0 disables.')
    p.add_argument('--ckpt_step', '-s', type=int, default=2,
                   help='Validate every Nth checkpoint (+ last). -1 = only last.')
    p.add_argument('--reset', action='store_true', help='Remove previous output.')
    p.add_argument('--real_bpp', action='store_true',
                   help='Entropy-code each image for real (bit-exact round-trip '
                        'checked); prints real vs theoretical vs loss bpp.')
    p.add_argument('--num_devices', type=int, default=None,
                   help='Shard eval image batches over the first N devices '
                        '(default: all devices if >1, else single-device).')
    flags, unknown = p.parse_known_args()
    if unknown:
        print(f'Unknown flags: {unknown}')

    import jax
    mesh = None
    n_dev = flags.num_devices or len(jax.devices())
    if n_dev > 1:
        from imgcomp_cvpr_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(n_dev)

    image_paths, dataset_name = val_images.get_image_paths(flags.images)
    images_iterator = ImagesIterator(image_paths[:flags.how_many], dataset_name,
                                     flags.image_cache_max)
    val_flags = validate_lib.OutputFlags(flags.save_ours, flags.ckpt_step,
                                         flags.real_bpp)
    for ckpt_dir in logdir_lib.iter_ckpt_dirs(flags.log_dir_root, flags.job_ids):
        try:
            validate_lib.validate(
                ValidationDirs(ckpt_dir, flags.log_dir_root, dataset_name,
                               flags.reset),
                images_iterator, val_flags, mesh=mesh)
        except FileNotFoundError as e:
            print(f'*** Caught {e}')
            continue
    print('*** All given job_ids validated.')


if __name__ == '__main__':
    main()
