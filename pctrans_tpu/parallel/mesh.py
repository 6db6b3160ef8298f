"""Device mesh + sharding utilities.

The reference's entire distribution story is torch DDP/DataParallel with
NCCL (SURVEY.md section 2.2).  On TPU the same semantics are one ``jit``
program over a 1-axis ``Mesh``: the batch is sharded on the ``data`` axis,
parameters are replicated, and XLA inserts the gradient all-reduces that DDP
performed explicitly.  A second ``model`` axis is reserved for tensor
sharding of the large FFN/attention matmuls if models outgrow one chip.

Multi-host: the same program works after ``jax.distributed.initialize`` —
``create_mesh`` then spans all processes' devices and per-host data loading
feeds ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    data_axis = len(devices) // model_axis
    return Mesh(devices.reshape(data_axis, model_axis), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (dict of arrays, leading batch axis) on the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
