"""Two-process CPU simulation of the multi-host path.

Validates that ``initialize_distributed`` + ``create_mesh`` + per-host
``shard_batch`` (jax.make_array_from_process_local_data) compile and execute
one sharded train step across two OS processes — the closest single-machine
analogue of a 2-host TPU pod (the reference could only test its DDP path
with a real multi-GPU launch, SURVEY.md section 4).

Usage: python tools_dev/multihost_cpu_check.py
(spawns both worker processes itself; prints PASS/FAIL)
"""

import os
import subprocess
import sys

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())  # repo root (set as cwd by the launcher)

from pctrans_tpu.parallel import create_mesh, initialize_distributed, shard_batch

rank = initialize_distributed()
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
import numpy as np

mesh = create_mesh()  # 4 global devices (2 per process)
assert mesh.devices.size == 4

# global batch 8 -> 4 per process; each process contributes its local half
local = {
    "x": np.full((4, 3), rank, np.float32),
    "y": np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * rank,
}
batch = shard_batch(mesh, local)
assert batch["x"].shape == (8, 3), batch["x"].shape  # global shape

from jax.sharding import NamedSharding, PartitionSpec as P

@jax.jit
def step(b):
    # a psum-like global reduction: every process must see the same value
    return (b["x"].sum() + b["y"].sum()) * 0.5

val = float(step(batch))
expected = 0.5 * (0 * 12 + 1 * 12                 # x: rank fills
                  + 2 * np.arange(12).sum() + 100 * 12)
assert abs(val - expected) < 1e-3, (val, expected)
print(f"worker {rank}: global reduction = {val} OK", flush=True)
"""


def main():
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("PALLAS_AXON_POOL_IPS",)}
    procs = []
    for rank in range(2):
        env = dict(env_base,
                   JAX_PLATFORMS="cpu",
                   COORDINATOR_ADDRESS="localhost:12355",
                   NUM_PROCESSES="2",
                   PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    ok = True
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        tail = out.decode(errors="replace").strip().splitlines()[-3:]
        print(f"--- worker {rank} (rc={p.returncode})")
        print("\n".join(tail))
        ok &= p.returncode == 0
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
