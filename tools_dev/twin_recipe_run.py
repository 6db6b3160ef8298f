"""Twin training runs: TPU-recipe estimators vs exact reference estimators.

Measures, at the metric level, the deviations the TPU recipe makes for
speed (stride-4 mask logits, shared-candidate weighted PointRend sampling,
stride-2 loss targets, bf16 sampling contractions) against the exact
reference data flow (upsampled stride-2 logits, per-mask exact top-k
selection at candidate_ratio 3.0, full-resolution targets, f32 sampling).
Both runs share seeds, data and schedule; the only difference is the
MODEL.MASK_FORMER.TPU_RECIPE.* switches.

Usage: python tools_dev/twin_recipe_run.py [--iters 2500] [--val-every 500]
Writes outputs/twin_tpu/ and outputs/twin_exact/, then prints both SBD
trajectories side by side.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = [
    "--config-base", "configs/CVPPP/CVPPP-PCTrans-Base.yaml",
    "--config-file", "configs/CVPPP/CVPPP-PCTrans.yaml",
]

# Random-init conditioning (runs/RUNS.md synth_cvppp_r2): synthetic images
# are already ~unit-scale floats and there are no pretrained frozen BN
# statistics, so the recipe's PIXEL_STD 255 / FrozenBN assumptions don't
# apply.  Both arms share these, so the estimator comparison is unaffected.
COMMON_OPTS = [
    "MODEL.PIXEL_STD", "[1.0,1.0,1.0]",
    "MODEL.RESNETS.NORM", "BN",
]

EXACT = [
    "MODEL.MASK_FORMER.TPU_RECIPE.POINT_SELECT", "exact",
    "MODEL.MASK_FORMER.TPU_RECIPE.CANDIDATE_RATIO", "3.0",
    "MODEL.MASK_FORMER.TPU_RECIPE.EXACT_TARGETS", "True",
    "MODEL.MASK_FORMER.TPU_RECIPE.SAMPLE_DTYPE", "float32",
    "MODEL.MASK_FORMER.TPU_RECIPE.UPSAMPLE2X", "True",
]


def run(name, iters, val_every, extra):
    out = f"outputs/twin_{name}"
    cmd = [sys.executable, "scripts/main.py", *COMMON, "--opts",
           "DATASET.DATA_TYPE", "synthetic",
           "DATASET.OUTPUT_PATH", out,
           "SOLVER.ITERATION_TOTAL", str(iters),
           "SOLVER.ITERATION_VAL", str(val_every),
           "SOLVER.ITERATION_SAVE", str(iters),
           "SOLVER.START_SAVE", str(iters),
           *COMMON_OPTS,
           *extra]
    print(f"=== twin run '{name}': {' '.join(cmd[2:])}", flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)
    evals = []
    with open(os.path.join(REPO, out, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "eval" in rec:
                evals.append((rec["iter"], rec["eval"]["SBD"]))
    return evals


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2500)
    p.add_argument("--val-every", type=int, default=500)
    args = p.parse_args()

    tpu = run("tpu", args.iters, args.val_every, [])
    exact = run("exact", args.iters, args.val_every, EXACT)

    print("\niter   SBD(tpu recipe)   SBD(exact reference estimators)")
    for (it, a), (_, b) in zip(tpu, exact):
        print(f"{it:>5}  {a:>14.4f}   {b:>14.4f}   delta {a - b:+.4f}")


if __name__ == "__main__":
    main()
