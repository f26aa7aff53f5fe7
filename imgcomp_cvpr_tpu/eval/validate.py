"""Validation driver (ref: val.py:40-212).

Sweeps checkpoints x images for one run: per image computes cross-entropy
bpp, MS-SSIM, PSNR (and, with real_bpp, the actual entropy-coded bpp via
the TPU codec with a bit-exact round-trip check), writes measures.csv,
aggregates, and records validated iterations.

TPU shape discipline: XLA compiles one executable per distinct padded image
shape (Kodak has two orientations => two compiles); the per-shape fetch
functions are cached.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from os import path, makedirs
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.images_iterator import ImagesIterator
from ..models import autoencoder as ae_lib
from ..models import probclass as pc_lib
from ..ops import metrics as metrics_lib
from ..ops import msssim as msssim_lib
from ..training import checkpoint as checkpoint_lib
from ..utils import config as config_lib
from ..utils import logdir as logdir_lib
from .val_files import MeasuresWriter, ValidationDirs


class OutputFlags:
    def __init__(self, save_ours: bool = False, ckpt_step: int = -1,
                 real_bpp: bool = False, eval_batch: int = 8):
        self.save_ours = save_ours
        self.ckpt_step = ckpt_step
        self.real_bpp = real_bpp
        self.eval_batch = eval_batch


class EvalModel:
    """Jitted per-image metrics computation for a fixed (ae, pc) config pair.

    With a mesh, image batches are sharded over the mesh's data axis and
    params replicated — per-device image sharding per SURVEY §2 (the model
    is purely convolutional, so batch DP is exact: per-image results are
    bitwise independent of the device count)."""

    def __init__(self, ae_config, pc_config, mesh=None):
        self.ae_config = ae_config
        self.pc_config = pc_config
        self.ae = ae_lib.get_network_cls(ae_config)(ae_config)
        self.pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
        self.mesh = mesh
        self.params = None  # set via set_params

    def set_params(self, params: Dict, batch_stats: Dict) -> None:
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib
            self.params = mesh_lib.replicate(params, self.mesh)
            self.batch_stats = mesh_lib.replicate(batch_stats, self.mesh)
        else:
            self.params = jax.device_put(params)
            self.batch_stats = jax.device_put(batch_stats)

    @functools.lru_cache(maxsize=32)
    def _fetch_fn(self, b: int, h: int, w: int, pad_info):
        hp_lo, wp_lo, oh, ow = pad_info

        @jax.jit
        def fetch(params, batch_stats, x_uint8):
            x = x_uint8.astype(jnp.float32)        # (B, H, W, 3) padded frame
            ae_vars = {'params': params['ae'], 'batch_stats': batch_stats}
            enc = self.ae.apply(ae_vars, x, False, method='encode')
            x_out = self.ae.apply(ae_vars, enc.qhard, False, method='decode')
            centers = params['ae']['encoder']['centers']
            # bitcost from qbar at eval (ref: val.py:88)
            bc = self.pc.bitcost(
                {'params': params['pc']}, enc.qbar, enc.symbols,
                pad_value=pc_lib.auto_pad_value(self.pc_config, centers,
                                                {'params': params['pc']}))
            x_out_uint8 = x_out.astype(jnp.uint8)
            # Metrics and saved outputs on the UNPADDED frame (static crop;
            # fixes the reference's open TODO, ref images_iterator.py:40).
            # bpp uses the real pixel count too: the bits cover the padded
            # latent, so pad rows honestly raise bpp for non-x8 inputs.
            xc = jax.lax.slice(
                x, (0, hp_lo, wp_lo, 0), (b, hp_lo + oh, wp_lo + ow, 3))
            oc_uint8 = jax.lax.slice(
                x_out_uint8, (0, hp_lo, wp_lo, 0),
                (b, hp_lo + oh, wp_lo + ow, 3))
            oc = oc_uint8.astype(jnp.float32)
            num_pixels = jnp.float32(oh * ow)
            return {
                'bpp': jnp.sum(bc, axis=(1, 2, 3)) / num_pixels,
                'ms-ssim': jax.vmap(lambda a, b_: msssim_lib.msssim_eval(
                    a[None], b_[None]))(xc, oc),
                'psnr': metrics_lib.psnr_per_image(xc, oc, cast_to_int=True),
                'sym': enc.symbols,
                'img_out': oc_uint8,
            }
        return fetch

    def fetch_many(self, imgs_hwc_uint8, pad_info=None,
                   pad_batch_to: int = 0) -> 'list[Dict[str, np.ndarray]]':
        """Run a batch of same-shaped padded images in one device pass
        (the reference evaluates one image per sess.run, ref val.py:158);
        returns one dict per image. pad_info = (hp_lo, wp_lo, orig_h,
        orig_w) crops metrics/outputs to the unpadded frame (None = whole
        frame). pad_batch_to pins the compiled batch size (tail batches are
        padded by repeating the last image; pad results are dropped — one
        executable per shape instead of one per tail size). With a mesh,
        the batch dim is additionally padded to the device count and
        sharded."""
        n_real = len(imgs_hwc_uint8)
        batch = np.stack(imgs_hwc_uint8)
        if pad_batch_to > n_real:
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], pad_batch_to - n_real, axis=0)])
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib
            batch = mesh_lib.pad_batch_to_multiple(
                batch, self.mesh.devices.size)
            x_dev = mesh_lib.shard_batch(batch, self.mesh)
        else:
            x_dev = jnp.asarray(batch)
        b, h, w = batch.shape[:3]
        if pad_info is None:
            pad_info = (0, 0, h, w)
        out = jax.device_get(self._fetch_fn(b, h, w, tuple(pad_info))(
            self.params, self.batch_stats, x_dev))
        return [{k: v[i] for k, v in out.items()} for i in range(n_real)]

    def fetch(self, img_hwc_uint8: np.ndarray) -> Dict[str, np.ndarray]:
        return self.fetch_many([img_hwc_uint8])[0]


def build_eval_model_from_log_dir(log_dir: str, mesh=None) -> EvalModel:
    """Recover configs from the log-dir name (config identity is part of
    checkpoint identity, ref: val.py:69-72)."""
    from ..utils import constants
    base_ae = constants.CONFIG_BASE_AE or path.join(config_lib.default_config_root(), 'ae')
    base_pc = constants.CONFIG_BASE_PC or path.join(config_lib.default_config_root(), 'pc')
    ae_path, pc_path = logdir_lib.config_paths_from_log_dir(
        log_dir, base_dirs=[base_ae, base_pc])
    ae_config, _ = config_lib.parse(ae_path, base_dir=base_ae)
    pc_config, _ = config_lib.parse(pc_path, base_dir=base_pc)
    return EvalModel(ae_config, pc_config, mesh=mesh)


def iter_shape_buckets(padded_iter, batch_size: int):
    """Group (name, img, pad_info) items into same-shape batches of up to
    batch_size, keyed by (padded shape, pad geometry): every image joins a
    full batch regardless of dataset ordering (adjacency-only batching
    degrades to B=1 on shape-interleaved datasets). Memory stays bounded
    at #distinct-shapes x batch_size images. Yields (names, imgs,
    pad_info)."""
    buckets: Dict = {}
    for img_name, img, pad_info in padded_iter:
        key = (img.shape, pad_info)
        names, imgs = buckets.setdefault(key, ([], []))
        names.append(img_name)
        imgs.append(img)
        if len(imgs) >= batch_size:
            yield names, imgs, pad_info
            del buckets[key]
    for (_, pad_info), (names, imgs) in buckets.items():
        yield names, imgs, pad_info


class ValuesAggregator:
    def __init__(self, *tags):
        self.tags = tags
        self._values = defaultdict(list)

    def update(self, otp: Dict) -> None:
        for tag in self.tags:
            v = float(otp[tag])
            assert not np.isnan(v), f'nan in {tag}'
            self._values[tag].append(v)

    def averages(self) -> Dict[str, float]:
        return {t: float(np.mean(v)) for t, v in self._values.items()}

    def averages_str(self) -> str:
        return ', '.join(f'{t}: {v:.3f}' for t, v in self.averages().items())


def validate(val_dirs: ValidationDirs, images_iterator: ImagesIterator,
             flags: OutputFlags, eval_model: Optional[EvalModel] = None,
             mesh=None) -> None:
    validated = set(val_dirs.get_validated_checkpoints())
    all_ckpts = checkpoint_lib.all_ckpts_with_iterations(val_dirs.ckpt_dir)
    if not all_ckpts:
        print(f'No checkpoints found in {val_dirs.ckpt_dir}')
        return
    ckpts_to_check = all_ckpts[:-1:flags.ckpt_step] + [all_ckpts[-1]] \
        if flags.ckpt_step != -1 else [all_ckpts[-1]]
    missing = [(i, p) for i, p in ckpts_to_check if i not in validated]
    if not missing:
        print('All checkpoints validated, stopping...')
        return

    if eval_model is None:
        eval_model = build_eval_model_from_log_dir(val_dirs.log_dir, mesh=mesh)

    codec = None
    if flags.real_bpp:
        from ..coding import codec as codec_mod
        # The real-bpp roundtrip runs per shape BUCKET (the reference
        # entropy-codes one image per ~550 s, ref bit_counter.py:13-74;
        # we batch the whole bucket through one kernel dispatch). With a
        # mesh the batch shards over the data axis (the codec pads
        # indivisible batches to a device multiple itself).
        codec = codec_mod.LatentCodec(eval_model.pc, eval_model.pc_config,
                                      mesh=mesh)

    saver = checkpoint_lib.Saver(val_dirs.ckpt_dir)
    last_itr = missing[-1][0]
    for ckpt_itr, ckpt_path in missing:
        print(f'- Validating ckpt {ckpt_itr} ----------')
        raw, _ = saver.restore(ckpt_itr)
        eval_model.set_params(raw['params'], raw['batch_stats'])

        agg = ValuesAggregator('bpp', 'ms-ssim', 'psnr')
        measures_writer = MeasuresWriter(val_dirs.out_dir)
        img_counter = [0]

        def process(names, imgs, pad_info):
            """One batched device pass over same-shaped images (the
            reference runs one sess.run per image, ref val.py:158). Metrics
            are computed on the unpadded frame (pad_info)."""
            outs = eval_model.fetch_many(imgs, pad_info=pad_info,
                                         pad_batch_to=flags.eval_batch)
            num_pixels = pad_info[2] * pad_info[3]
            real_results = None
            if flags.real_bpp:
                # Whole-bucket entropy roundtrip in one batched dispatch
                # (the reference codes one image per ~550 s, ref
                # bit_counter.py:13-74), bit-exactness asserted batched.
                centers = jax.device_get(
                    eval_model.params['ae']['encoder']['centers'])
                syms_batch = np.stack(
                    [np.transpose(o['sym'], (2, 0, 1)) for o in outs]
                ).astype(np.int8)                       # NHWC -> NCHW
                pc_vars = {'params': eval_model.params['pc']}
                real_results = codec.encode_batch(pc_vars, syms_batch,
                                                  centers)
                decoded = codec.decode_batch(
                    pc_vars, [r.bitstream for r in real_results], centers)
                np.testing.assert_array_equal(
                    decoded, syms_batch.astype(np.int32))
            for i, (img_name, img, otp) in enumerate(zip(names, imgs, outs)):
                measures_writer.append(img_name, {k: float(otp[k])
                                                  for k in ('bpp', 'ms-ssim', 'psnr')})
                if real_results is not None:
                    result = real_results[i]
                    bpp_real = result.num_bits / num_pixels
                    bpp_theory = result.theoretical_bits / num_pixels
                    bpp_loss = float(otp['bpp'])
                    print(f'BPP: Real         {bpp_real:.5f}\n'
                          f'     Theoretical: {bpp_theory:.5f} '
                          f'[{bpp_theory / bpp_real * 100:5.1f}% of real]\n'
                          f'     Loss:        {bpp_loss:.5f} '
                          f'[{bpp_loss / bpp_real * 100:5.1f}% of real]')
                if flags.save_ours and ckpt_itr == last_itr:
                    save_img(img_name, otp['img_out'], val_dirs)
                agg.update(otp)
                print(f'{img_counter[0]: 10d} {img_name} | '
                      f'Mean: {agg.averages_str()}', flush=True)
                img_counter[0] += 1

        for names, imgs, pad_info in iter_shape_buckets(
                images_iterator.iter_padded(pad=ae_lib.SUBSAMPLING_FACTOR),
                flags.eval_batch):
            process(names, imgs, pad_info)
        measures_writer.close()
        avgs = agg.averages()
        # Distance to BPG at the mean operating point (ref: val.py:198-206).
        try:
            from . import codec_distance as cd
            d_ms = cd.CodecDistance(images_iterator.dataset_name, 'bpg',
                                    'ms-ssim').distance(avgs['bpp'],
                                                        avgs['ms-ssim'])
            d_psnr = cd.CodecDistance(images_iterator.dataset_name, 'bpg',
                                      'psnr').distance(avgs['bpp'], avgs['psnr'])
            print(f'Distance to BPG: {d_ms:.3f} ms-ssim // {d_psnr:.3f} psnr')
            avgs['distance_BPG_MS-SSIM'] = d_ms
            avgs['distance_BPG_PSNR'] = d_psnr
        except Exception as e:
            print(f'*** Distance to BPG not available: {e}')
        summary_path = path.join(val_dirs.out_dir, f'summary_{ckpt_itr}.json')
        import json
        with open(summary_path, 'w') as f:
            json.dump({'iteration': ckpt_itr, **avgs}, f, indent=1)
        val_dirs.add_validated_checkpoint(ckpt_itr)
    print(f'Validation completed {val_dirs}')


def save_img(img_name: str, img_out_hwc: np.ndarray, val_dirs: ValidationDirs) -> None:
    from PIL import Image
    img_dir = path.join(val_dirs.out_dir, 'imgs')
    makedirs(img_dir, exist_ok=True)
    arr = np.asarray(img_out_hwc)
    if arr.ndim == 4:
        arr = arr[0]
    Image.fromarray(arr).save(path.join(img_dir, img_name))
