"""Profile the eval step (CVPPP protocol shapes) on the real TPU."""
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

from pctrans_tpu.engine.state import TrainState, make_eval_step
from pctrans_tpu.models import ModelConfig, PCTransModel

TRACE_DIR = "/tmp/eval_trace"


def main():
    # default: CVPPP protocol; "bbbc" arg switches to the BBBC protocol
    # (520x696, batch 2, 300 queries, full-Q upsample — bench.py's second
    # metric)
    if len(sys.argv) > 1 and sys.argv[1] == "bbbc":
        B, H, W, Q, top_k = 2, 520, 696, 300, None
    else:
        B, H, W, Q, top_k = 10, 530, 500, 100, 50
    config = ModelConfig(dtype="bfloat16", num_queries=Q)
    model = PCTransModel(config=config, train=False)
    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randn(B, H, W, 3), jnp.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       frozen=variables.get("frozen", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)
    step = jax.jit(make_eval_step(config, top_k=top_k))

    probs, peaks = step(state, x)
    float(peaks.ravel()[0])
    t0 = time.perf_counter()
    out = x[:, 0, 0, 0] * 0
    for _ in range(5):
        probs, peaks = step(state, x + out[0] * 0)
        out = peaks[:, 0]
    float(out[0])
    dt = (time.perf_counter() - t0) / 5
    print(f"eval step: {dt*1e3:.1f} ms  ({B/dt:.1f} img/s)", flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        probs, peaks = step(state, x + out[0] * 0)
        out = peaks[:, 0]
    float(out[0])
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
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:30]
    print("\ntop device spans over 3 steps (us/step):")
    for name, d in top:
        print(f"  {d/3:>10.0f}  x{cnt[name]//3:<5} {name[:110]}")

    # aggregate by op-name family so the long tail is visible
    import re
    fam_dur = defaultdict(float)
    fam_cnt = defaultdict(int)
    for name, d in dur.items():
        if "jit_eval_step" in name:
            continue
        fam = re.sub(r"[.\d]+$", "", name)
        fam_dur[fam] += d
        fam_cnt[fam] += cnt[name]
    print("\nby family (us/step):")
    total = 0.0
    for fam, d in sorted(fam_dur.items(), key=lambda kv: -kv[1])[:25]:
        total += d
        print(f"  {d/3:>10.0f}  x{fam_cnt[fam]//3:<5} {fam[:90]}")
    print(f"  families total: {total/3:.0f} us/step")


if __name__ == "__main__":
    main()
