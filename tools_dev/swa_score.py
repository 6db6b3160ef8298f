"""Score a finished SWA recipe run: SWA checkpoint vs plain checkpoints.

Round-4 verdict item 4: the SWA evidence needed a RECIPE-scale run (30k
iterations, SWA from 90% of budget) scored at convergence.  This scores an
output directory produced by `scripts/main.py` with `SOLVER.SWA.ENABLED`:
every numbered checkpoint from --start plus `checkpoint_swa`, through the
standard eval chain (Trainer.eval_cvppp — exact reference protocol), and
writes `swa_sweep.json`.

Usage:
  python tools_dev/swa_score.py --run /tmp/swa_cvppp_r5 [--start 15000]
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="training output dir")
    p.add_argument("--start", type=int, default=0,
                   help="skip numbered checkpoints below this iteration")
    p.add_argument("--out", default=None,
                   help="JSON output path (default <run>/swa_sweep.json)")
    args = p.parse_args()

    from pctrans_tpu.config import load_cfg, update_inference_cfg
    from pctrans_tpu.engine import checkpoint as ckpt
    from pctrans_tpu.engine.trainer import Trainer
    from pctrans_tpu.parallel import replicate

    run = os.path.abspath(args.run)
    cfg = load_cfg(None, os.path.join(run, "config.yaml"),
                   opts=["INFERENCE.OUTPUT_PATH", os.path.join(run, "inf"),
                         "DATASET.OUTPUT_PATH", run],
                   freeze=False)
    cfg = update_inference_cfg(cfg)
    cfg.freeze()
    tr = Trainer(cfg, mode="test")

    names = []
    for c in ckpt.list_checkpoints(run):
        base = os.path.basename(c)
        if "swa" in base:
            continue
        it = int(base.rsplit("_", 1)[-1])
        if it >= args.start:
            names.append((f"iter_{it}", c))
    swa = os.path.join(run, "checkpoint_swa")
    if os.path.isdir(swa):
        names.append(("swa", swa))
    assert names, f"no checkpoints in {run}"

    rows = []
    for name, path in names:
        tr.state = replicate(tr.mesh, ckpt.restore_checkpoint(path, tr.state))
        res = tr.eval_cvppp(model_name=f"swa_score:{name}")
        rows.append({"name": name, **{k: float(v) for k, v in res.items()}})
        print(name, res, flush=True)

    out = args.out or os.path.join(run, "swa_sweep.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
