"""Real-vs-theoretical bpp pairing (ref: bpp_helpers.py:13-31).

Thin convenience over the latent codec: given a symbol volume, entropy-code
it for real (bit-exact round-trip checked) and return (real bpp,
theoretical bpp).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import codec as codec_lib


def num_pixels_in_image(img_hwc: np.ndarray) -> int:
    return int(img_hwc.shape[0] * img_hwc.shape[1])


class BppFetcher:
    def __init__(self, codec: codec_lib.LatentCodec, pc_params, centers):
        self.codec = codec
        self.pc_params = pc_params
        self.centers = np.asarray(centers)

    def get_bpp(self, symbols_chw: np.ndarray, num_pixels: int
                ) -> Tuple[float, float]:
        """-> (bpp_real, bpp_theoretical); asserts bit-exact round-trip."""
        result = self.codec.roundtrip(self.pc_params, symbols_chw, self.centers)
        return (result.num_bits / num_pixels,
                result.theoretical_bits / num_pixels)
