"""Round-5 audit (VERDICT r4 weak #4): does the K=3 kernel compile at
bsub > 4 now that the enc/dec variant split dropped the freq/cdf output,
teacher-input, and stream VMEM blocks?

Static VMEM arithmetic says no for bf16 rings at Kodak (the rings alone
exceed the 16 MB budget before any stream buffer):

    ring bytes = (VR*Q_CH*2) + 3*(VR*kf*prec_bytes) per lane column,
    W_ALL = bsub * LSEG lanes (LSEG = 512 at Kodak (32, 64, 96)):
      bsub=4 bf16: rings ~9.4 MB + r0 1.0 + X 2.8  = ~13.2 MB  (fits)
      bsub=6 bf16: rings ~14.2 MB + r0 1.6 + X 4.1 = ~19.9 MB  (over)
      bsub=8 bf16: rings ~18.9 MB + r0 2.1 + X 5.5 = ~26.5 MB  (over)
      bsub=8 f8:   rings ~9.4 MB + r0 2.1 + X 5.5  = ~17.0 MB  (fits
        with the dropped blocks; f8 is the measured 2x-slower path)

The split freed O(100 KB)-scale stream/teacher/table blocks — two orders
below the ring growth — so the round-3 hypothesis ("the dec split might
unlock bsub>4") is arithmetically dead for bf16. This probe confirms on
the live chip: attempt to compile + roundtrip the production codec at a
forced bsub, print the Mosaic/XLA VMEM error verbatim (or the timing if
it does fit).

Usage: python dev_probes/_probe32_bsub_audit.py [BSUB] [PREC] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BSUB = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PREC = sys.argv[2] if len(sys.argv) > 2 else 'bf16'
B = int(sys.argv[3]) if len(sys.argv) > 3 else BSUB
os.environ['IMGCOMP_PALLAS_BSUB'] = str(BSUB)
os.environ['IMGCOMP_PALLAS_PREC'] = PREC

import numpy as np
import jax

os.makedirs('/root/repo/.jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib
from imgcomp_cvpr_tpu.coding import codec as codec_lib

SHAPE = (32, 64, 96)
pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
L = 6
pc = pc_lib.ProbClassifier(pc_config, L)
rng = np.random.RandomState(0)
pc_params = pc.init(jax.random.PRNGKey(1), (1, SHAPE[1], SHAPE[2], SHAPE[0]))
centers = np.linspace(-2, 2, L).astype(np.float32)
syms = rng.randint(0, L, size=(B,) + SHAPE).astype(np.int8)

codec = codec_lib.LatentCodec(pc, pc_config)
mp = B * SHAPE[1] * SHAPE[2] * 64 / 1e6

print(f'attempting bsub={BSUB} prec={PREC} B={B} at Kodak {SHAPE}...',
      flush=True)
t0 = time.time()
try:
    enc = codec.encode_batch(pc_params, syms, centers)
    print(f'ENCODE COMPILED+RAN in {time.time() - t0:.1f}s', flush=True)
    t0 = time.time()
    dec = codec.decode_batch(pc_params, [r.bitstream for r in enc], centers)
    np.testing.assert_array_equal(dec, syms.astype(np.int32))
    print(f'DECODE COMPILED+RAN in {time.time() - t0:.1f}s — roundtrip '
          'bit-exact', flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        enc = codec.encode_batch(pc_params, syms, centers)
        dec = codec.decode_batch(pc_params, [r.bitstream for r in enc],
                                 centers)
        ts.append(time.time() - t0)
    t = min(ts)
    print(f'warm enc+dec {t * 1e3:.0f} ms -> {mp / t:.2f} MP/s', flush=True)
except Exception as e:  # noqa: BLE001 — the error text IS the result
    msg = str(e)
    print(f'FAILED after {time.time() - t0:.1f}s: {type(e).__name__}',
          flush=True)
    print(msg[:2000], flush=True)
