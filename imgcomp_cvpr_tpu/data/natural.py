"""Deterministic 1/f^2 ('pink spectrum') synthetic natural-statistics
images.

Real photographic scenes have an ~1/f^2 power spectrum; procedural
images with that spectrum exercise a learned image codec far more
honestly than the sinusoid-grid `synthetic` source (whose energy sits in
a handful of frequencies the autoencoder memorizes). The reference
trains/evaluates on real datasets (ref: inputpipeline.py:70,
val_images.py:12-24) that cannot be fetched in this zero-egress
environment; this module is the stand-in used for demo training runs and
the committed R-D curve artifact. Every image is a pure function of its
index, so datasets need no files and regenerate bit-identically
anywhere.

An image is built from four independent pink-noise fields: a shared
luminance field plus small per-channel deviations (the same recipe as
bench.py's content, kept in one place here).
"""

from __future__ import annotations

import numpy as np


def pink_field(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """One 1/f-amplitude (=> 1/f^2 power) noise field, min-max mapped to
    [0, 1]. (h, w) float32."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    spec = (1.0 / f) * np.exp(2j * np.pi * rng.rand(h, w))
    x = np.real(np.fft.ifft2(spec)).astype(np.float32)
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / (hi - lo + 1e-9)


def natural_image(idx: int, h: int = 512, w: int = 768) -> np.ndarray:
    """Deterministic HWC uint8 RGB image #idx (0.8 shared luminance +
    0.2 per-channel pink deviations)."""
    # fold the shape into the seed so differently-sized sets are
    # independent; keep within the 32-bit RandomState seed range
    rng = np.random.RandomState((idx * 2654435761 + h * 40503 + w) % (2**31))
    base = pink_field(rng, h, w)
    out = np.empty((h, w, 3), np.float32)
    for c in range(3):
        out[:, :, c] = np.clip(0.8 * base + 0.2 * pink_field(rng, h, w),
                               0.0, 1.0) * 255.0
    return np.round(out).astype(np.uint8)
