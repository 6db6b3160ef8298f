"""One-command real-data entry point: point at CVPPP/BBBC + R-50.pkl and go.

No real dataset exists on this host (round-4/5 standing item), so the real
run has been rehearsed only through the byte-identical fixture layouts
(`pctrans_tpu/data/fixtures.py`, `tests/test_fixtures.py`).  This script
makes the eventual real run turnkey:

    python tools_dev/run_real.py --dataset cvppp \
        --data /path/to/CVPPP2017_A1 --weights /path/to/R-50.pkl \
        --out runs/real_cvppp [--eval-only] [--dry-run]

It (1) validates the on-disk layout against what the loaders expect,
with friendly errors naming the missing pieces (reference layouts:
dataset_CVPPP.py:56-119, dataset_BBBC.py:47-105); (2) sanity-opens the
`R-50.pkl` Caffe2 manifest (loaded at train time by
``Trainer._load_backbone_weights`` → ``convert_d2_r50_pickle``); then
(3) runs the verbatim reference recipe via ``scripts/main.py`` and the
checkpoint sweep via ``scripts/eval.py`` — the exact commands are printed
first, so ``--dry-run`` doubles as documentation.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "cvppp": ("configs/CVPPP/CVPPP-PCTrans-Base.yaml",
              "configs/CVPPP/CVPPP-PCTrans.yaml"),
    "bbbc": ("configs/BBBC/BBBC-PCTrans-Base.yaml",
             "configs/BBBC/BBBC-PCTrans.yaml"),
}


def check_layout(dataset: str, root: str) -> None:
    problems = []
    if dataset == "cvppp":
        for split in ("train", "val"):
            d = os.path.join(root, split)
            if not os.path.isdir(d):
                problems.append(f"missing directory {d}")
                continue
            plants = [f for f in os.listdir(d) if f.endswith("_rgb.png")]
            if not plants:
                problems.append(f"{d}: no plantXXX_rgb.png files")
            for p in plants[:3]:
                stem = p[:-8]
                for suffix in ("_label.png", "_fg.png"):
                    if not os.path.exists(os.path.join(d, stem + suffix)):
                        problems.append(f"{d}/{stem}{suffix} missing "
                                        "(rgb present)")
    else:
        for sub in ("images", "label_instance", "metadata"):
            if not os.path.isdir(os.path.join(root, sub)):
                problems.append(f"missing directory {root}/{sub}")
        for meta in ("training.txt", "validation.txt", "test.txt"):
            mp = os.path.join(root, "metadata", meta)
            if not os.path.exists(mp):
                problems.append(f"missing {mp}")
            else:
                # the loader strips 5 trailing chars from each RAW line
                # (".png" + newline, dataset_BBBC.py) — mirror that here
                names = [ln.rstrip("\n")[:-4]
                         for ln in open(mp).read().splitlines() if ln]
                for n in names[:3]:
                    tif = os.path.join(root, "images", n + ".tif")
                    if not os.path.exists(tif):
                        problems.append(f"{meta}: listed image {tif} missing")
    if problems:
        sys.exit("[run_real] data layout problems:\n  " +
                 "\n  ".join(problems) +
                 "\n  expected layouts: pctrans_tpu/data/fixtures.py "
                 "docstring (byte-identical to the reference loaders)")
    print(f"[run_real] {dataset} layout at {root}: OK")


def check_weights(path: str) -> None:
    from pctrans_tpu.models.resnet import convert_d2_r50_pickle

    params, frozen = convert_d2_r50_pickle(path, 50)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"[run_real] {path}: converted R-50 manifest OK ({n/1e6:.1f}M "
          "backbone params)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=("cvppp", "bbbc"), required=True)
    p.add_argument("--data", required=True, help="dataset root directory")
    p.add_argument("--weights", default="", help="path to R-50.pkl")
    p.add_argument("--out", default="runs/real")
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; sweep existing checkpoints")
    p.add_argument("--dry-run", action="store_true",
                   help="validate + print the commands without running")
    p.add_argument("--opts", nargs="*", default=[],
                   help="extra KEY VALUE config overrides")
    args = p.parse_args()

    check_layout(args.dataset, args.data)
    if args.weights:
        check_weights(args.weights)
    else:
        print("[run_real] WARNING: no --weights; training from random init "
              "(the recipe's FrozenBN/PIXEL_STD assumptions expect "
              "ImageNet R-50 — see runs/RUNS.md synth_cvppp_r2)")

    base, exp = CONFIGS[args.dataset]
    out = os.path.abspath(args.out)
    common = ["--config-base", base, "--config-file", exp]
    opts = ["DATASET.DATA_TYPE", args.dataset.upper(),
            "DATASET.INPUT_PATH", os.path.abspath(args.data),
            "DATASET.OUTPUT_PATH", out,
            "INFERENCE.OUTPUT_PATH", os.path.join(out, "inference")]
    if args.weights:
        opts += ["MODEL.WEIGHTS", os.path.abspath(args.weights)]
    opts += list(args.opts)

    train_cmd = [sys.executable, "scripts/main.py", *common, "--opts", *opts]
    sweep_cmd = [sys.executable, "scripts/eval.py", "--name", args.dataset,
                 "--out", os.path.join(out, "sweep.json"),
                 *common, "--opts", *opts]
    print("[run_real] train command:\n  " + " ".join(train_cmd))
    print("[run_real] sweep command:\n  " + " ".join(sweep_cmd))
    if args.dry_run:
        return
    if not args.eval_only:
        subprocess.run(train_cmd, cwd=REPO, check=True)
    subprocess.run(sweep_cmd, cwd=REPO, check=True)


if __name__ == "__main__":
    main()
