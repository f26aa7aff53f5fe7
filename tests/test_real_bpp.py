"""End-to-end real entropy coding through the val path: encode an image's
latent with the TPU codec, verify the bit-exact round-trip, and check the
entropy-consistency triangle (real ~ theoretical ~ loss bpp), the
reference's --real_bpp oracle (ref: bit_counter.py:51-57, val.py:168-175)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.coding import codec as codec_lib
from imgcomp_cvpr_tpu.models import autoencoder as ae_lib
from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.ops import bits as bits_lib
from imgcomp_cvpr_tpu.utils import config as config_lib


@pytest.mark.parametrize('impl', ['ring', 'direct'])
def test_entropy_consistency_triangle(impl):
    ae_config, _ = config_lib.parse_spec('cvpr/low', 'ae')
    pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    ae_config = ae_config.replace(arch_param_B=1, num_chan_bn=8)
    pc_config = pc_config.replace(arch_param__k=8)

    ae = ae_lib.get_network_cls(ae_config)(ae_config)
    pc = pc_lib.ProbClassifier(pc_config, ae_config.num_centers)
    codec = codec_lib.LatentCodec(pc, pc_config, impl=impl)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 48, 64, 3).astype(np.float32) * 255.0)
    ae_vars = ae.init(jax.random.PRNGKey(0), x, False)
    pc_vars = pc.init(jax.random.PRNGKey(1), (1, 6, 8, ae_config.num_chan_bn))
    centers = np.asarray(jax.device_get(ae_vars['params']['encoder']['centers']))

    enc = ae.apply(ae_vars, x, False, method='encode')
    # loss bpp from the parallel bitcost pass (qhard, like the test graph)
    bc = pc.bitcost(pc_vars, enc.qhard, enc.symbols,
                    pad_value=pc_lib.auto_pad_value(pc_config, jnp.asarray(centers)))
    bpp_loss = float(bits_lib.bitcost_to_bpp(bc, x))

    syms = np.transpose(np.asarray(jax.device_get(enc.symbols[0])), (2, 0, 1))
    result = codec.roundtrip(pc_vars, syms, centers)  # bit-exact gate

    num_pixels = 48 * 64
    bpp_real = result.num_bits / num_pixels
    bpp_theory = result.theoretical_bits / num_pixels

    # theoretical (quantized-CDF) bpp tracks the loss bpp
    assert bpp_theory == pytest.approx(bpp_loss, rel=2e-2), (bpp_theory, bpp_loss)
    # real coded size = theoretical + per-lane/header overhead (large for a
    # tiny image; asserted as an absolute bit bound)
    from imgcomp_cvpr_tpu.coding import wavefront
    sched = wavefront.build_schedule(tuple(syms.shape), 9)
    overhead_bits = 8 * (4 + 2 + 6 + 4 + 4) + sched.M * (32 + 32 + 16)
    assert result.num_bits <= result.theoretical_bits + overhead_bits
