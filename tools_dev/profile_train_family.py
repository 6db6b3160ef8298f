"""Family-level device-time breakdown of the bench-config train step.

Same model/criterion/flags as bench.py bench_train (noremat recipe config),
traced for 3 steps; spans aggregated by family (digits stripped) and, where
the trace carries HLO metadata args, by source op_name prefix.
"""
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

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

import shutil as _shutil
TRACE_DIR = "/tmp/train_fam_trace"
_shutil.rmtree(TRACE_DIR, ignore_errors=True)  # a stale trace must never be re-read


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
    float(m["loss"])

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    s2 = st
    for _ in range(3):
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

    # dump one sample event's args to see available metadata
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in tpu_pids
                and e.get("name", "").startswith("fusion") and e.get("args")):
            print("sample fusion args:", json.dumps(e["args"])[:400])
            break

    dur = defaultdict(float)
    cnt = defaultdict(int)
    src_dur = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e["name"]
        if "jit_train_step" in name:
            continue
        d = e.get("dur", 0)
        dur[name] += d
        cnt[name] += 1
        args = e.get("args") or {}
        srcname = args.get("tf_op") or args.get("long_name") or ""
        if srcname:
            # take the leading scope path component(s)
            parts = str(srcname).split("/")
            key = "/".join(parts[:3])
            src_dur[key] += d

    fam_dur = defaultdict(float)
    fam_cnt = defaultdict(int)
    for name, d in dur.items():
        fam = re.sub(r"[.\d]+$", "", name)
        fam_dur[fam] += d
        fam_cnt[fam] += cnt[name]
    print("\nby family (us/step):")
    total = 0.0
    for fam, d in sorted(fam_dur.items(), key=lambda kv: -kv[1])[:30]:
        total += d
        print(f"  {d/3:>10.0f}  x{fam_cnt[fam]//3:<5} {fam[:90]}")
    print(f"  families total: {total/3:.0f} us/step")

    if src_dur:
        print("\nby source scope (us/step):")
        for key, d in sorted(src_dur.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {d/3:>10.0f}  {key[:110]}")


if __name__ == "__main__":
    main()
