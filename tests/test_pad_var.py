"""learn_pad_var: the learned padding variable (ref: probclass.py:307-338).

The reference defines pc_pad_grad for a trainable pad value but its bitcost
hardcodes learn_pad_var=False (ref: probclass.py:84); here the config key is
honored: a scalar 'pad_var' param joins the PC tree and gradients reach it
through the padding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from imgcomp_cvpr_tpu.models import probclass as pc_lib
from imgcomp_cvpr_tpu.utils import config as config_lib


def _pc(learn: bool):
    cfg, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    cfg = cfg.replace(arch_param__k=8, learn_pad_var=learn)
    return cfg, pc_lib.ProbClassifier(cfg, 6)


def test_pad_var_param_exists_only_when_configured():
    cfg_on, pc_on = _pc(True)
    cfg_off, pc_off = _pc(False)
    p_on = pc_on.init(jax.random.PRNGKey(0), (1, 6, 7, 4))
    p_off = pc_off.init(jax.random.PRNGKey(0), (1, 6, 7, 4))
    assert 'pad_var' in p_on['params']
    assert 'pad_var' not in p_off['params']


def test_pad_var_receives_gradient():
    cfg, pc = _pc(True)
    params = pc.init(jax.random.PRNGKey(1), (1, 6, 7, 4))
    rng = np.random.RandomState(0)
    centers = jnp.linspace(-2, 2, 6)
    q = jnp.asarray(rng.rand(1, 6, 7, 4).astype(np.float32))
    syms = jnp.asarray(rng.randint(0, 6, (1, 6, 7, 4)))

    def loss(p):
        pad = pc_lib.auto_pad_value(cfg, centers, p)
        return jnp.sum(pc.bitcost(p, q, syms, pad_value=pad))

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g['params']['pad_var'])) > 0.0


def test_pad_var_requires_params():
    cfg, _ = _pc(True)
    try:
        pc_lib.auto_pad_value(cfg, jnp.zeros(6))
    except ValueError as e:
        assert 'learn_pad_var' in str(e)
    else:
        raise AssertionError('expected ValueError')


def test_trainer_runs_with_pad_var():
    """End-to-end: one train step with learn_pad_var=True moves pad_var."""
    from imgcomp_cvpr_tpu.training import trainer as trainer_lib
    ae_cfg, _ = config_lib.parse_spec('cvpr/low_demo', 'ae')
    pc_cfg, _ = config_lib.parse_spec('cvpr/res_shallow_demo', 'pc')
    ae_cfg = ae_cfg.replace(arch_param_B=1, num_chan_bn=4, batch_size=2,
                            crop_size=(32, 32))
    pc_cfg = pc_cfg.replace(arch_param__k=8, learn_pad_var=True)
    t = trainer_lib.Trainer(ae_cfg, pc_cfg, num_train_images=64)
    state = t.init_state(jax.random.PRNGKey(0), crop_hw=(32, 32), batch_size=2)
    v0 = float(state.params['pc']['pad_var'])
    batch = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 255
    state, _ = t.train_step(state, jnp.asarray(batch))
    state, _ = t.train_step(state, jnp.asarray(batch))
    v1 = float(state.params['pc']['pad_var'])
    assert v0 != v1, 'pad_var did not move under training'
