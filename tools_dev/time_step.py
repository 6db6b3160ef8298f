"""Attribute train-step wall time: compile vs per-step run, on the TINY config."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import jax.numpy as jnp

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.data.synthetic import SyntheticDataset
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import SetCriterion, CriterionConfig
from pctrans_tpu.models import PCTransModel, ModelConfig

TINY = ModelConfig(
    hidden_dim=32, conv_dim=32, mask_dim=8, num_queries=10, nheads=4,
    dim_feedforward=64, enc_layers=1, dec_layers=3, head_norm="GN",
    backbone_depth=14,
)
CRIT = CriterionConfig(num_points=256, dec_layers=4)


def main():
    t0 = time.perf_counter()
    cfg = get_cfg_defaults()
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.BASE_LR = 3e-4
    model = PCTransModel(config=TINY, train=True)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)

    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    ds = SyntheticDataset(size=(32, 32), length=1, n_instances=(2, 4))
    it = ds[0]
    batch = {"image": jnp.asarray(it["image"][None]), "label": jnp.asarray(it["label"][None])}

    criterion = SetCriterion(CRIT)
    step = jax.jit(make_train_step(TINY, criterion, tx, max_instances=8))
    rng = jax.random.key(0)

    t0 = time.perf_counter()
    lowered = step.lower(state, batch, rng)
    print(f"trace: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

    for i in range(12):
        t0 = time.perf_counter()
        state, metrics = compiled(state, batch, rng)
        loss = float(metrics["loss"])
        print(f"step {i}: {time.perf_counter()-t0:.2f}s loss={loss:.3f}", flush=True)


if __name__ == "__main__":
    main()
