"""Data-parallel correctness: the same train step on 1 device vs sharded
across the 8-device mesh must produce (numerically) identical losses and
parameters — the standard JAX way to validate multi-chip code without a
pod (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgcomp_cvpr_tpu.parallel import mesh as mesh_lib
from imgcomp_cvpr_tpu.training import trainer as trainer_lib
from imgcomp_cvpr_tpu.utils import config as config_lib


def tiny_configs():
    ae, _ = config_lib.parse_spec('cvpr/low', 'ae')
    pc, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    ae = ae.replace(arch_param_B=1, num_chan_bn=4, batch_size=8,
                    crop_size=(32, 32), distortion_to_minimize='mse')
    pc = pc.replace(arch_param__k=4)
    return ae, pc


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, jax.devices()
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_matches_single_device():
    ae, pc = tiny_configs()
    batch = np.random.RandomState(0).rand(8, 32, 32, 3).astype(np.float32) * 255

    # single device
    t1 = trainer_lib.Trainer(ae, pc, num_train_images=64, mesh=None)
    s1 = t1.init_state(jax.random.PRNGKey(0), crop_hw=(32, 32), batch_size=8)
    s1_params0 = jax.device_get(s1.params)
    s1, comps1 = t1.train_step(s1, jnp.asarray(batch))

    # 8-device data parallel
    mesh = mesh_lib.make_mesh()
    t8 = trainer_lib.Trainer(ae, pc, num_train_images=64, mesh=mesh)
    s8 = t8.init_state(jax.random.PRNGKey(0), crop_hw=(32, 32), batch_size=8)
    s8_params0 = jax.device_get(s8.params)
    s8, comps8 = t8.train_step(s8, mesh_lib.shard_batch(batch, mesh))

    # same init
    for a, b in zip(jax.tree_util.tree_leaves(s1_params0),
                    jax.tree_util.tree_leaves(s8_params0)):
        np.testing.assert_array_equal(a, b)

    assert float(comps1['total_loss']) == pytest.approx(
        float(comps8['total_loss']), rel=1e-5)
    # parameters after the step agree to numerical tolerance (reduction
    # order differs across shardings)
    # Adam normalizes by ~zero second moments at step 1, amplifying
    # reduction-order noise; tolerate rare small element diffs.
    p1 = jax.tree_util.tree_leaves(jax.device_get(s1.params))
    p8 = jax.tree_util.tree_leaves(jax.device_get(s8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=5e-4)
        assert np.mean(np.abs(np.asarray(a) - np.asarray(b))) < 1e-6


def test_dp_batch_sharding_layout():
    mesh = mesh_lib.make_mesh()
    batch = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    sharded = mesh_lib.shard_batch(batch, mesh)
    assert sharded.sharding.num_devices == 8
    # each device holds exactly one batch element
    shard = sharded.addressable_shards[0]
    assert shard.data.shape == (1, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(sharded), batch)


def test_pad_batch_to_multiple():
    b = np.zeros((5, 2, 2, 3), np.float32)
    out = mesh_lib.pad_batch_to_multiple(b, 8)
    assert out.shape[0] == 8
    out2 = mesh_lib.pad_batch_to_multiple(b, 5)
    assert out2.shape[0] == 5
