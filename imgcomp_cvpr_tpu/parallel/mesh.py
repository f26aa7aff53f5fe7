"""Device mesh + sharding helpers for data-parallel training.

The workload (a ~10M-param conv codec) scales by batch data-parallelism:
a 1D mesh over all chips with the batch dim sharded on axis 'data'. Model
params/batch-stats are replicated; XLA inserts the gradient all-reduce
over ICI automatically when the jitted loss averages over the global batch
(SURVEY.md §2 "TPU-native equivalent").

Evaluation parallelism shards images over the same axis. No TP/PP — the
model is far below the size where those pay off.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First (batch) dim sharded across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the batch dim sharded."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def pad_batch_to_multiple(batch: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the leading dim (repeating the last element) so it divides the mesh."""
    n = batch.shape[0]
    rem = n % multiple
    if rem == 0:
        return batch
    pad = multiple - rem
    return np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)], axis=0)
