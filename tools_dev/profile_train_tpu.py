"""Profile the full-size train step on the real TPU and print top device ops.

Methodology (see memory: tpu-relay-benchmarking): chained python dispatch
with a dependent scalar fetch for honest timing; jax.profiler trace parsed
from the Perfetto JSON (filter the /device:TPU:0 pid; spans nest, so the
per-op totals can exceed the program span).
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.config import load_cfg
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import build_criterion
from pctrans_tpu.models import PCTransModel, build_model_config

TRACE_DIR = "/tmp/train_trace"


def main():
    cfg = load_cfg("/root/reference/configs/CVPPP/CVPPP-PCTrans-Base.yaml",
                   "/root/reference/configs/CVPPP/CVPPP-PCTrans.yaml",
                   freeze=False)
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.freeze()
    mc = build_model_config(cfg)
    criterion = build_criterion(cfg)
    model = PCTransModel(config=mc, train=True)
    rng = jax.random.key(0)
    img = jnp.zeros((2, 448, 448, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, img)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       frozen=variables.get("frozen", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step = jax.jit(make_train_step(mc, criterion, tx,
                                   cfg.MODEL.MAX_INSTANCES))
    lab = np.zeros((2, 448, 448), np.int32)
    lab[:, 100:200, 100:200] = 1
    lab[:, 250:350, 250:350] = 2
    batch = {"image": img, "label": jnp.asarray(lab)}

    t0 = time.perf_counter()
    state2, m = step(state, batch, rng)
    print("first loss", float(m["loss"]),
          f"(compile+run {time.perf_counter()-t0:.1f}s)", flush=True)

    # honest steady-state: chained dispatch, dependent scalar fetch
    t0 = time.perf_counter()
    s = state2
    N = 10
    for _ in range(N):
        s, m = step(s, batch, rng)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / N
    print(f"steady-state step: {dt*1e3:.1f} ms  ({2/dt:.1f} img/s)", flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    s2 = s
    for _ in range(3):
        s2, m = step(s2, batch, rng)
    _ = float(m["loss"])
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz",
                              recursive=True), key=os.path.getmtime)
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:TPU:0" in str(e.get("args", {}).get("name", ""))}
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:40]
    total = sum(v for _, v in top)
    print(f"\ntop device spans over 3 steps (us; nested totals):")
    for name, d in top:
        print(f"  {d/3:>10.0f}  x{cnt[name]//3:<4} {name[:110]}")


if __name__ == "__main__":
    main()
