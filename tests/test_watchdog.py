"""Dispatch-stall watchdog (VERDICT r2 #4): a wedged device fetch must
raise instead of hanging, and the train loop's fallback path is driven by
the same helper."""

import time

import numpy as np
import pytest

from imgcomp_cvpr_tpu.utils import watchdog


def test_fetch_with_timeout_passes_through():
    out = watchdog.fetch_with_timeout({'a': np.arange(3)}, timeout_s=5.0)
    np.testing.assert_array_equal(out['a'], np.arange(3))


def test_fetch_with_timeout_raises_on_stall():
    def blocking_get(tree):
        time.sleep(30.0)
        return tree

    t0 = time.time()
    with pytest.raises(watchdog.DispatchStallError, match='wedged'):
        watchdog.fetch_with_timeout('x', timeout_s=0.2, what='simulated stall',
                                    _get=blocking_get)
    assert time.time() - t0 < 5.0  # returned at the deadline, not after 30s


def test_fetch_with_timeout_propagates_errors():
    def failing_get(tree):
        raise ValueError('boom')

    with pytest.raises(ValueError, match='boom'):
        watchdog.fetch_with_timeout('x', timeout_s=5.0, _get=failing_get)


def test_train_flags_carry_timeout():
    from imgcomp_cvpr_tpu.training.train_loop import TrainFlags
    f = TrainFlags(dispatch_timeout_s=123.0)
    assert f.dispatch_timeout_s == 123.0


def test_train_loop_falls_back_to_spd1_on_stall(tmp_path, monkeypatch):
    """Simulated wedge of the first fused multi-step dispatch: the loop
    must restore the pre-dispatch state, drop to steps_per_dispatch=1, and
    finish the run (VERDICT r2 #4 'survives a wedged dispatch')."""
    import test_e2e
    from imgcomp_cvpr_tpu.training import train_loop
    from imgcomp_cvpr_tpu.utils import constants, logdir as logdir_lib
    from imgcomp_cvpr_tpu.training import checkpoint as checkpoint_lib

    ae_root = tmp_path / 'cfg_ae'
    pc_root = tmp_path / 'cfg_pc'
    ae_root.mkdir()
    pc_root.mkdir()
    (ae_root / 'tiny').write_text(test_e2e.TINY_AE)
    (pc_root / 'tiny_pc').write_text(test_e2e.TINY_PC)
    monkeypatch.setenv('CONFIG_BASE_AE', str(ae_root))
    monkeypatch.setenv('CONFIG_BASE_PC', str(pc_root))
    monkeypatch.setattr(constants, 'CONFIG_BASE_AE', str(ae_root))
    monkeypatch.setattr(constants, 'CONFIG_BASE_PC', str(pc_root))

    real_fetch = watchdog.fetch_with_timeout
    stalled = []

    def fake_fetch(tree, timeout_s, what='device fetch', _get=None):
        if 'fused dispatch' in what and not stalled:
            stalled.append(what)
            raise watchdog.DispatchStallError(f'simulated stall of {what}')
        return real_fetch(tree, timeout_s, what=what, _get=_get)

    monkeypatch.setattr(train_loop.watchdog_lib, 'fetch_with_timeout',
                        fake_fetch)

    flags = train_loop.TrainFlags(log_interval_train=2, log_interval_test=-1,
                                  log_interval_save=100, max_steps=6,
                                  steps_per_dispatch=4)
    log_dir = train_loop.train('tiny', 'tiny_pc',
                               dataset_train='synthetic:4',
                               dataset_test='synthetic:2',
                               log_dir_root=str(tmp_path / 'logs'),
                               flags=flags)
    assert stalled, 'the fused-dispatch verification path never ran'
    ckpt_dir = logdir_lib.ckpt_dir_for_log_dir(log_dir)
    itrs = [i for i, _ in checkpoint_lib.all_ckpts_with_iterations(ckpt_dir)]
    assert itrs and max(itrs) == 6, itrs  # run completed despite the stall
