"""Measure device-time vs dispatch-time for the train step (relay overhead).

The round-3 profiler showed jit_train_step device spans of ~27 ms while
chained python dispatch measures 70-87 ms/step.  This script quantifies the
gap: per-program device spans, inter-program idle gaps, and python-chain
timing at two lengths, to decide whether the bench's train number is
measuring the TPU or this environment's relay.
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.data.synthetic import SyntheticDataset
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import SetCriterion, CriterionConfig
from pctrans_tpu.models import PCTransModel, ModelConfig

TRACE_DIR = "/tmp/gap_trace"


def main():
    B, S = 2, 448
    cfg = get_cfg_defaults()
    config = ModelConfig(dtype="bfloat16", remat=False)
    criterion = SetCriterion(CriterionConfig())
    model = PCTransModel(config=config, train=True)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, S, S, 3)))
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    ds = SyntheticDataset(size=(S, S), length=B)
    items = [ds[i] for i in range(B)]
    batch = {
        "image": jax.device_put(jnp.asarray(np.stack([it["image"] for it in items]))),
        "label": jax.device_put(jnp.asarray(np.stack([it["label"] for it in items]))),
    }
    step = jax.jit(make_train_step(config, criterion, tx, max_instances=40))
    rng = jax.random.key(0)

    st, m = step(state, batch, rng)
    float(m["loss"])  # compile + warmup

    for N in (5, 20):
        s = st
        t0 = time.perf_counter()
        for _ in range(N):
            s, m = step(s, batch, rng)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / N
        print(f"python chain N={N:>2}: {dt*1e3:7.1f} ms/step", flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    s2 = st
    for _ in range(6):
        s2, m = step(s2, batch, rng)
    float(m["loss"])
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz", recursive=True),
                    key=os.path.getmtime)
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:TPU:0" in str(e.get("args", {}).get("name", ""))}
    spans = [e for e in events
             if e.get("ph") == "X" and e.get("pid") in tpu_pids
             and "jit_train_step" in e.get("name", "")]
    spans.sort(key=lambda e: e["ts"])
    print(f"\n{len(spans)} jit_train_step program spans:")
    prev_end = None
    for e in spans:
        gap = (e["ts"] - prev_end) / 1e3 if prev_end is not None else 0.0
        print(f"  start={e['ts']/1e3:12.3f} ms dur={e['dur']/1e3:8.3f} ms "
              f"gap_before={gap:8.3f} ms")
        prev_end = e["ts"] + e["dur"]


if __name__ == "__main__":
    main()
