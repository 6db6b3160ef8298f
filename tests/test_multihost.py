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

Cost control on this 1-CPU host: one virtual device per process (2-device
global mesh), one image per rank, and the single-process comparison runs
inside rank 0 (plain jit over replicated arrays — no third interpreter,
no parent-side jax setup).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time
_t0 = time.perf_counter()
def _mark(label):
    print("PHASE %-12s %7.1fs" % (label, time.perf_counter() - _t0),
          flush=True)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.environ["PCTRANS_REPO"])
sys.path.insert(0, os.path.join(os.environ["PCTRANS_REPO"], "tests"))

import numpy as np
import jax.numpy as jnp

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import CriterionConfig, SetCriterion
from pctrans_tpu.models import ModelConfig, PCTransModel
from pctrans_tpu.parallel import create_mesh, initialize_distributed, \
    replicate, shard_batch

_mark("imports")
rank = initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
_mark("rendezvous")

# Micro topology: the equivalence under test is the mesh / collective /
# process-local-data path, which is depth-independent — and rank 1's SPMD
# compile misses the persistent cache every run (only rank 0's entry is
# ever served), so the compile IS the test's cost.
MICRO = ModelConfig(hidden_dim=32, conv_dim=32, mask_dim=8, num_queries=8,
                    nheads=4, dim_feedforward=32, enc_layers=1, dec_layers=1,
                    head_norm="GN", backbone_depth=14)
MCRIT = CriterionConfig(num_points=64, dec_layers=2)
cfg = get_cfg_defaults()
cfg.SOLVER.WARMUP_ITERS = 0
model = PCTransModel(config=MICRO, train=True)
variables = jax.jit(model.init)(jax.random.key(0),
                                jnp.zeros((1, 32, 32, 3)))
tx = build_optimizer(cfg, variables["params"])
state = TrainState(step=jnp.zeros((), jnp.int32),
                   params=variables["params"],
                   frozen=variables.get("frozen", {}),
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]))
_mark("setup")
from pctrans_tpu.data.synthetic import SyntheticDataset
ds = SyntheticDataset(size=(32, 32), length=2, n_instances=(2, 4))
items = [ds[i] for i in range(2)]
global_batch = {
    "image": np.stack([it["image"] for it in items]),
    "label": np.stack([it["label"] for it in items]),
}
local = {k: v[rank:rank + 1] for k, v in global_batch.items()}

mesh = create_mesh()
assert mesh.devices.size == 2

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
_mark("barrier0")

step = jax.jit(make_train_step(MICRO, SetCriterion(MCRIT), tx,
                               max_instances=8))
key0 = jax.random.key(0)
with mesh:
    state_r = replicate(mesh, state)
    batch = shard_batch(mesh, local)   # process-local -> global array
    assert batch["image"].shape[0] == 2
    _mark("replicate")

    # Rank 1's SPMD compile used to miss the persistent cache EVERY run
    # (~35 s recompile — this test's entire cost), for two compounding
    # reasons: (a) the cache key's accelerator_config entry hashes
    # get_topology_for_devices(), which on multi-process CPU embeds
    # process-local topology detail, so the ranks never produce the same
    # key; and (b) jax only writes cache entries from process 0, so rank
    # 1's compiles were never persisted either.  Force the device-kind
    # fallback hash (identical across ranks) so both ranks share ONE key,
    # and order the compiles: rank 0 compiles first (writing the entry),
    # then rank 1 compiles and is served the just-written disk entry —
    # fast even on a fully cold cache, with no cross-process executable
    # serialization (jax.experimental.serialize_executable round-trips
    # fail at execution on this host: AOT machine-feature mismatch).
    from jax._src import cache_key as _ck
    if hasattr(_ck, "_hash_accelerator_config") and hasattr(_ck, "_hash_devices"):
        # private jax API (observed stable through jax 0.9): if a jax
        # upgrade renames these, fall through to per-rank cache keys — the
        # test still passes, it just re-pays rank-1's ~35 s compile
        _ck._hash_accelerator_config = (
            lambda hash_obj, accelerators: _ck._hash_devices(hash_obj,
                                                             accelerators))
    if rank == 0:
        compiled = step.lower(state_r, batch, key0).compile()
        client.wait_at_barrier("pctrans_mh_compiled", 900_000)
    else:
        client.wait_at_barrier("pctrans_mh_compiled", 900_000)
        compiled = step.lower(state_r, batch, key0).compile()
    _mark("compile")
    client.wait_at_barrier("pctrans_mh_run", 900_000)
    _, metrics = compiled(state_r, batch, key0)
    print("MULTIHOST_LOSS %.8f" % float(metrics["loss"]), flush=True)
    _mark("dist_step")

if rank == 0:
    # single-process value on the SAME global batch: plain jit over this
    # process's device only (no mesh, no collectives)
    sp_batch = {k: jnp.asarray(v) for k, v in global_batch.items()}
    _, sp_metrics = step(state, sp_batch, key0)
    print("SINGLEPROC_LOSS %.8f" % float(sp_metrics["loss"]), flush=True)
    _mark("singleproc")

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
    single = []
    logs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        text = out.decode(errors="replace")
        logs.append(text)
        assert p.returncode == 0, f"worker {rank} failed:\n{text[-3000:]}"
        for line in text.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                losses.append(float(line.split()[1]))
            if line.startswith("SINGLEPROC_LOSS"):
                single.append(float(line.split()[1]))
    assert len(losses) == 2 and len(single) == 1, logs
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
    assert losses[0] == pytest.approx(single[0], rel=2e-3)
