"""Standalone image <-> compressed-file codec CLI.

The reference never shipped this: its only real-bitstream path is the
val.py --real_bpp round-trip, and its README files "encoding to a file"
under what "should be done" for a practical implementation (ref
README.md:57-74). This tool is that practical implementation on the
TPU-native stack: `compress` runs AE encode + the wavefront entropy
coder and writes a self-describing `.icz` file; `decompress` restores
the PNG. Integrity is double-checked: the entropy container's symbol
CRC (decode fails loudly on corruption/model mismatch) plus a model tag
in the header (CRC of the center values) so a wrong checkpoint is
rejected before a confusing mis-decode.

File format (little-endian):
    magic b'ICZ1' | u16 orig_h | u16 orig_w | u32 model_tag
    | u32 n_bytes | <entropy container bytes (coding/codec.py)>

Model loading: --log_dir (configs recovered from the log-dir name +
latest/itr orbax checkpoint, same as val.py) or --npz (a flat
params/batch_stats tree like assets/demo_trained_low_9000.npz) with
--ae_config/--pc_config specs.

Usage:
    python -m imgcomp_cvpr_tpu.tools.codec_cli compress kodim01.png \
        -o kodim01.icz --npz assets/demo_trained_low_9000.npz
    python -m imgcomp_cvpr_tpu.tools.codec_cli decompress kodim01.icz \
        -o kodim01_out.png --npz assets/demo_trained_low_9000.npz
"""

from __future__ import annotations

import argparse
import struct
import sys
import zlib
from typing import Optional, Tuple

import numpy as np

_MAGIC = b'ICZ1'
_PAD = 8   # AE subsampling factor (ref autoencoder.py:214-216)


class CodecModel:
    """(ae, pc, params) bundle with jitted encode/decode halves and the
    entropy codec; shared by compress and decompress."""

    def __init__(self, ae_config, pc_config, params, batch_stats):
        import jax
        from ..coding import codec as codec_lib
        from ..models import autoencoder as ae_lib
        from ..models import probclass as pc_lib
        self.ae_config = ae_config
        self.ae = ae_lib.get_network_cls(ae_config)(ae_config)
        self.pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
        self.codec = codec_lib.LatentCodec(self.pc, pc_config)
        self.ae_vars = {'params': jax.device_put(params['ae']),
                        'batch_stats': jax.device_put(batch_stats)}
        self.pc_vars = {'params': jax.device_put(params['pc'])}
        self.centers = np.asarray(
            jax.device_get(params['ae']['encoder']['centers']), np.float32)

        import jax.numpy as jnp

        @jax.jit
        def enc(ae_vars, x_uint8):
            x = x_uint8.astype(jnp.float32)
            out = self.ae.apply(ae_vars, x, False, method='encode')
            return jnp.transpose(out.symbols, (0, 3, 1, 2)).astype(jnp.int8)

        @jax.jit
        def dec(ae_vars, syms_chw):
            s = jnp.transpose(syms_chw, (0, 2, 3, 1)).astype(jnp.int32)
            q = jnp.asarray(self.centers)[s]
            x = self.ae.apply(ae_vars, q, False, method='decode')
            return jnp.clip(x, 0, 255).astype(jnp.uint8)

        self._enc, self._dec = enc, dec

    @property
    def model_tag(self) -> int:
        """Cheap model-identity check: CRC32 of the center values. Wrong
        checkpoints with identical centers still fail the container's
        symbol CRC at decode."""
        return zlib.crc32(self.centers.tobytes()) & 0xFFFFFFFF

    def compress(self, img_hwc: np.ndarray) -> bytes:
        import jax
        from ..data.images_iterator import add_padding
        oh, ow = img_hwc.shape[:2]
        assert oh < 65536 and ow < 65536, 'image too large for u16 header'
        padded, _ = add_padding(img_hwc.astype(np.uint8), _PAD)
        syms = self._enc(self.ae_vars, padded[None])
        (res,) = self.codec.encode_batch(self.pc_vars, syms, self.centers)
        bs = res.bitstream
        return (_MAGIC + struct.pack('<HHII', oh, ow, self.model_tag,
                                     len(bs)) + bs)

    def decompress(self, blob: bytes) -> np.ndarray:
        import jax
        assert blob[:4] == _MAGIC, 'not an ICZ1 file'
        oh, ow, tag, n = struct.unpack('<HHII', blob[4:16])
        if tag != self.model_tag:
            raise ValueError(
                f'model tag mismatch: file 0x{tag:08x} vs loaded model '
                f'0x{self.model_tag:08x} — wrong checkpoint for this file')
        bs = blob[16:16 + n]
        assert len(bs) == n, 'truncated file'
        syms = self.codec.decode_batch(self.pc_vars, [bs], self.centers,
                                       device_out=True)
        x = np.asarray(jax.device_get(self._dec(self.ae_vars,
                                                syms.astype(np.int8))))[0]
        hp = (_PAD - oh % _PAD) % _PAD
        wp = (_PAD - ow % _PAD) % _PAD
        hp_lo, wp_lo = hp // 2, wp // 2
        return x[hp_lo:hp_lo + oh, wp_lo:wp_lo + ow, :]


def _load_npz_tree(path: str):
    z = np.load(path)
    tree: dict = {}
    for key in z.files:
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = z[key]
    return tree['params'], tree['batch_stats']


def load_model(log_dir: Optional[str] = None, npz: Optional[str] = None,
               ae_spec: str = 'cvpr/low', pc_spec: str = 'cvpr/res_shallow',
               itr: Optional[int] = None) -> CodecModel:
    from ..utils import config as config_lib
    if log_dir:
        from os import path as osp
        from ..eval.validate import build_eval_model_from_log_dir
        from ..training import checkpoint as ckpt_lib
        em = build_eval_model_from_log_dir(log_dir)
        saver = ckpt_lib.Saver(osp.join(log_dir, 'ckpts'))
        raw, _ = saver.restore(itr)
        return CodecModel(em.ae_config, em.pc_config,
                          raw['params'], raw['batch_stats'])
    assert npz, 'need --log_dir or --npz'
    params, batch_stats = _load_npz_tree(npz)
    ae_config, _ = config_lib.parse_spec(ae_spec, 'ae')
    pc_config, _ = config_lib.parse_spec(pc_spec, 'pc')
    return CodecModel(ae_config, pc_config, params, batch_stats)


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument('mode', choices=['compress', 'decompress', 'roundtrip'])
    p.add_argument('input')
    p.add_argument('-o', '--output', required=True)
    p.add_argument('--log_dir', help='training log dir (configs + ckpts)')
    p.add_argument('--itr', type=int, help='checkpoint iteration (latest '
                   'if omitted)')
    p.add_argument('--npz', help='flat params/batch_stats npz asset')
    p.add_argument('--ae_config', default='cvpr/low')
    p.add_argument('--pc_config', default='cvpr/res_shallow')
    a = p.parse_args(argv)
    model = load_model(log_dir=a.log_dir, npz=a.npz, ae_spec=a.ae_config,
                       pc_spec=a.pc_config, itr=a.itr)
    if a.mode == 'compress':
        from PIL import Image
        with Image.open(a.input) as im:
            img = np.asarray(im.convert('RGB'), np.uint8)
        blob = model.compress(img)
        with open(a.output, 'wb') as f:
            f.write(blob)
        bpp = len(blob) * 8 / (img.shape[0] * img.shape[1])
        print(f'{a.input} -> {a.output}: {len(blob)} bytes, '
              f'{bpp:.4f} bpp (file, incl. header)')
    elif a.mode == 'roundtrip':
        # image -> .icz file -> image with metrics: the per-image self-check
        # the reference runs inside val.py --real_bpp (ref bit_counter.py:
        # 13-74), as a one-command user tool. Decode integrity is CRC-
        # gated; metrics quantify the lossy AE, not the (lossless) coder.
        from PIL import Image
        from ..ops import metrics as metrics_lib
        with Image.open(a.input) as im:
            img = np.asarray(im.convert('RGB'), np.uint8)
        blob = model.compress(img)
        with open(a.output, 'wb') as f:
            f.write(blob)
        out = model.decompress(blob)
        bpp = len(blob) * 8 / (img.shape[0] * img.shape[1])
        psnr = metrics_lib.psnr_np(img, out)
        print(f'{a.input} -> {a.output} -> reconstructed: {len(blob)} bytes '
              f'({bpp:.4f} bpp), decode CRC-verified, PSNR {psnr:.2f} dB')
    else:
        from PIL import Image
        with open(a.input, 'rb') as f:
            blob = f.read()
        out = model.decompress(blob)
        Image.fromarray(out).save(a.output)
        print(f'{a.input} -> {a.output}: {out.shape[1]}x{out.shape[0]}')


if __name__ == '__main__':
    sys.exit(main())
