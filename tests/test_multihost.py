"""Real 2-process multi-host CI test.

Spawns two OS processes that rendezvous via ``jax.distributed.initialize``
(the TPU-native analogue of the reference's DDP process-group bring-up,
connectomics/utils/system.py:53-84), each contributing its process-LOCAL
half of a global batch through ``shard_batch``'s
``jax.make_array_from_process_local_data`` branch (parallel/mesh.py), and
runs the tiny-config sharded train step.  The resulting loss must agree
across both workers AND with a single-process run of the same global batch
— the multi-host equivalence the single-host virtual-mesh tests
(test_train.py) cannot exercise.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.environ["PCTRANS_REPO"])
sys.path.insert(0, os.path.join(os.environ["PCTRANS_REPO"], "tests"))

import numpy as np
import jax.numpy as jnp

from pctrans_tpu.losses import SetCriterion
from pctrans_tpu.engine.state import make_train_step
from pctrans_tpu.parallel import create_mesh, initialize_distributed, \
    replicate, shard_batch
from test_train import CRIT, TINY, tiny_setup

rank = initialize_distributed()
assert jax.process_count() == 2, jax.process_count()

cfg, model, tx, state, _ = tiny_setup(batch=1, size=32)
from pctrans_tpu.data.synthetic import SyntheticDataset
ds = SyntheticDataset(size=(32, 32), length=4, n_instances=(2, 4))
items = [ds[i] for i in range(4)]
global_batch = {
    "image": np.stack([it["image"] for it in items]),
    "label": np.stack([it["label"] for it in items]),
}
local = {k: v[rank * 2:(rank + 1) * 2] for k, v in global_batch.items()}

mesh = create_mesh()
assert mesh.devices.size == 4

# The gloo CPU-collective context has a hard 30 s key-value rendezvous
# timeout at first use, but on this loaded 1-CPU host the workers' import +
# setup phases skew by minutes.  Rendezvous at coordination-service barriers
# (plain KV store, long deadline, no gloo) before every gloo first-use:
# ``replicate``'s multi-process device_put allgathers immediately, and the
# compiled step's collectives run at execution.  Rank 1 additionally waits
# for rank 0 to populate the persistent compile cache so the expensive
# compile happens once instead of contending for the single CPU.
from jax._src.distributed import global_state
client = global_state.client
client.wait_at_barrier("pctrans_mh_setup", 900_000)

with mesh:
    state = replicate(mesh, state)
    batch = shard_batch(mesh, local)   # process-local -> global array
    assert batch["image"].shape[0] == 4
    step = jax.jit(make_train_step(TINY, SetCriterion(CRIT), tx,
                                   max_instances=8))

    key0 = jax.random.key(0)
    if rank == 1:
        client.wait_at_barrier("pctrans_mh_compiled", 900_000)
    compiled = step.lower(state, batch, key0).compile()
    if rank == 0:
        client.wait_at_barrier("pctrans_mh_compiled", 900_000)
    client.wait_at_barrier("pctrans_mh_run", 900_000)
    _, metrics = compiled(state, batch, key0)
    print("MULTIHOST_LOSS %.8f" % float(metrics["loss"]), flush=True)

# Rendezvous before interpreter exit: the coordination service's shutdown
# barrier only waits 30 s; make both processes reach it together.
client.wait_at_barrier("pctrans_mh_done", 900_000)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_loss_matches_single_process():
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    procs = []
    for rank in range(2):
        env = dict(env_base,
                   JAX_PLATFORMS="cpu",
                   PCTRANS_REPO=REPO,
                   COORDINATOR_ADDRESS="localhost:12391",
                   NUM_PROCESSES="2",
                   PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    losses = []
    logs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        text = out.decode(errors="replace")
        logs.append(text)
        assert p.returncode == 0, f"worker {rank} failed:\n{text[-3000:]}"
        for line in text.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                losses.append(float(line.split()[1]))
    assert len(losses) == 2, logs
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)

    # single-process value on the SAME global batch
    from pctrans_tpu.data.synthetic import SyntheticDataset
    from pctrans_tpu.engine.state import make_train_step
    from pctrans_tpu.losses import SetCriterion
    from test_train import CRIT, TINY, tiny_setup

    import jax.numpy as jnp

    cfg, model, tx, state, _ = tiny_setup(batch=1, size=32)
    ds = SyntheticDataset(size=(32, 32), length=4, n_instances=(2, 4))
    items = [ds[i] for i in range(4)]
    batch = {
        "image": jnp.asarray(np.stack([it["image"] for it in items])),
        "label": jnp.asarray(np.stack([it["label"] for it in items])),
    }
    step = jax.jit(make_train_step(TINY, SetCriterion(CRIT), tx,
                                   max_instances=8))
    _, metrics = step(state, batch, jax.random.key(0))
    assert losses[0] == pytest.approx(float(metrics["loss"]), rel=2e-3)
