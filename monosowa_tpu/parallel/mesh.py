"""Global device mesh + sharding helpers.

The reference's parallelism is single-host DataParallel with dormant
torch.distributed hooks (train_val.py:57-60, utils/misc.py:92-160).  The
TPU-native equivalent (SURVEY.md §2.5): one global ``jax.sharding.Mesh``
with a ``data`` axis (and a ``model`` axis reserved for larger variants);
the batch is sharded over ``data``; parameters are replicated; XLA inserts
the gradient all-reduce over ICI automatically when the jitted train step
consumes sharded inputs.

Multi-host extension: call ``jax.distributed.initialize()`` before
``make_mesh`` and the same code spans hosts over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put every array in the batch dict with its leading axis
    sharded over ``axis``."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
