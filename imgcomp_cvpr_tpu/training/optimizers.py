"""Learning-rate schedules and the two-group optimizer.

The reference trains AE vars with Adam(lr_ae) and context-model vars with
Adam(lr_pc) in a single train op (ref: train.py:339-349 via fjcommon's
create_train_op_with_different_lrs). Here the split is an
optax.multi_transform over a {'ae': ..., 'pc': ...} param pytree.

Schedules (ref: training_helpers.py:22-35): FIXED, or DECAY — staircase
exponential decay every ``lr_schedule_decay_interval`` epochs with rate
``lr_schedule_decay_rate``; iterations per epoch derive from the dataset
size and effective unique-images-per-batch (ref: training_helpers.py:51-60).
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def num_itr_per_epoch(num_images: int, batch_size: int, num_crops_per_img: int) -> int:
    unique_per_batch = max(batch_size // max(num_crops_per_img, 1), 1)
    return max(num_images // unique_per_batch, 1)


def make_schedule(config, itr_per_epoch: int) -> optax.Schedule:
    if config.lr_schedule == 'FIXED':
        return optax.constant_schedule(config.lr_initial)
    if config.lr_schedule == 'DECAY':
        return optax.exponential_decay(
            init_value=config.lr_initial,
            transition_steps=itr_per_epoch * config.lr_schedule_decay_interval,
            decay_rate=config.lr_schedule_decay_rate,
            staircase=bool(getattr_or(config, 'lr_schedule_decay_staircase', True)))
    raise ValueError(f'Invalid lr_schedule {config.lr_schedule}')


def getattr_or(config, key: str, default: Any) -> Any:
    try:
        return getattr(config, key)
    except AttributeError:
        return default


def make_single_optimizer(config, schedule: optax.Schedule) -> optax.GradientTransformation:
    opt = config.optimizer
    if opt == 'ADAM':
        return optax.adam(schedule)
    if opt == 'SGD':
        return optax.sgd(schedule)
    if opt == 'MOMENTUM':
        return optax.sgd(schedule, momentum=config.optimizer_momentum, nesterov=True)
    raise ValueError(f'Invalid optimizer {opt}')


def make_optimizer(ae_config, pc_config, itr_per_epoch: int) -> optax.GradientTransformation:
    """Optimizer over a params pytree with top-level keys 'ae' and 'pc'.

    Three groups: AE vars at lr_ae, context-model vars at lr_pc
    (ref: train.py:339-349), and optionally the quantizer centers at
    lr_ae * lr_centers_factor (ref: ae_configs/base:31)."""
    ae_sched = make_schedule(ae_config, itr_per_epoch)
    ae_opt = make_single_optimizer(ae_config, ae_sched)
    pc_opt = make_single_optimizer(pc_config, make_schedule(pc_config, itr_per_epoch))
    centers_factor = getattr_or(ae_config, 'lr_centers_factor', None)
    if centers_factor:
        centers_opt = make_single_optimizer(
            ae_config, lambda step: ae_sched(step) * centers_factor)
    else:
        centers_opt = ae_opt
    if not getattr_or(ae_config, 'train_autoencoder', True):
        ae_opt = optax.set_to_zero()
        centers_opt = optax.set_to_zero()
    if not getattr_or(ae_config, 'train_probclass', True):
        pc_opt = optax.set_to_zero()

    def label_fn(params):
        ae_labels = jax.tree.map(lambda _: 'ae', params['ae'])
        ae_labels['encoder'] = dict(ae_labels['encoder'])
        ae_labels['encoder']['centers'] = 'centers'
        return {'ae': ae_labels,
                'pc': jax.tree.map(lambda _: 'pc', params['pc'])}

    return optax.multi_transform(
        {'ae': ae_opt, 'pc': pc_opt, 'centers': centers_opt},
        param_labels=label_fn)
