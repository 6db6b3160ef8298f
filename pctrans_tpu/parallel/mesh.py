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

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: ``jax.distributed.initialize`` rendezvous.

    The TPU-native analogue of the reference's process-group init
    (connectomics/utils/system.py:53-84, ``dist.init_process_group('nccl',
    init_method='env://')``): arguments fall back to the same env:// style
    variables (``COORDINATOR_ADDRESS``/``MASTER_ADDR:MASTER_PORT``,
    ``NUM_PROCESSES``/``WORLD_SIZE``, ``PROCESS_ID``/``RANK``).  On real TPU
    pods all three are auto-detected and may be None.  Returns the process
    index; no-op (returns 0) when no multi-process env is configured.
    """
    env = os.environ
    coordinator = coordinator or env.get("COORDINATOR_ADDRESS") or (
        f"{env['MASTER_ADDR']}:{env['MASTER_PORT']}"
        if "MASTER_ADDR" in env and "MASTER_PORT" in env else None)
    if num_processes is None:
        n = env.get("NUM_PROCESSES") or env.get("WORLD_SIZE")
        num_processes = int(n) if n else None
    if process_id is None:
        r = env.get("PROCESS_ID") or env.get("RANK")
        process_id = int(r) if r else None
    if coordinator is None and num_processes is None:
        # No explicit rendezvous config.  This function is only called when
        # the user asked for distributed (--distributed / COORDINATOR_ADDRESS
        # in main.py), so let JAX auto-detect the cluster (Cloud TPU pods,
        # GKE, Slurm) — silently returning would leave each pod host
        # training an INDEPENDENT model into the same OUTPUT_PATH.  Where
        # there is no cluster to detect, initialize() raises without
        # touching any backend and we stay single-process.
        # Only swallow the failure when the environment shows no cluster at
        # all — on a host whose env markers say a pod/cluster IS expected
        # (TPU pod metadata, Slurm, GKE/Kubernetes, OMPI), a rendezvous
        # failure must be fatal: falling back would leave N independent
        # trainers writing the same OUTPUT_PATH, the exact failure mode
        # this branch exists to prevent.
        # Markers must indicate MULTIPLE workers, not the mere presence of
        # an orchestrator: KUBERNETES_SERVICE_HOST is injected into every
        # k8s pod (including single-host TPU VMs) and SLURM_JOB_ID exists
        # for ntasks=1 allocations — treating those as "cluster expected"
        # would turn a legitimate single-process run into a hard crash.
        def _multi(var):
            try:
                return int(env.get(var, "1")) > 1
            except ValueError:
                return False

        expected = []
        if env.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1:
            expected.append("TPU_WORKER_HOSTNAMES")  # >1 pod worker listed
        # TPU_WORKER_ID > 0 proves this process is a non-first pod worker
        # even when TPU_WORKER_HOSTNAMES is absent/malformed; it is 0 on
        # single-host TPU VMs, so it cannot false-positive those.
        try:
            if int(env.get("TPU_WORKER_ID", "0")) > 0:
                expected.append("TPU_WORKER_ID")
        except ValueError:
            pass
        if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
            expected.append("MEGASCALE_COORDINATOR_ADDRESS")
        expected += [m for m in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE")
                     if _multi(m)]
        try:
            jax.distributed.initialize()
            return jax.process_index()
        except Exception as e:
            if expected:
                raise RuntimeError(
                    "jax.distributed.initialize() auto-detection failed but "
                    f"the environment indicates a cluster ({', '.join(expected)}); "
                    "refusing to fall back to single-process training"
                ) from e
            print(f"[distributed] no cluster auto-detected "
                  f"({type(e).__name__}: {e}); running single-process")
            return 0
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def create_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    devices = np.asarray(jax.devices())  # all processes' devices (global)
    if n_devices is not None:
        devices = devices[:n_devices]
    data_axis = len(devices) // model_axis
    return Mesh(devices.reshape(data_axis, model_axis), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (dict of arrays, leading batch axis) on the mesh.

    Single-process: a plain sharded ``device_put``.  Multi-process: each host
    contributes its process-local shard of the global batch via
    ``jax.make_array_from_process_local_data`` (the per-host data-loading
    analogue of the reference's ``DistributedSampler``,
    data/dataset/build.py:392-395)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
