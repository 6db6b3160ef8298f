"""Scan a dataset's instance counts against MODEL.MAX_INSTANCES.

The training targets are padded to MODEL.MAX_INSTANCES slots
(pctrans_tpu/data/targets.py); any image with more instances silently loses
the excess from the loss.  This tool justifies the cap for a dataset the way
the reference justifies its 300-query BBBC recipe
(configs/BBBC/BBBC-PCTrans.yaml:35): run it once per dataset/config pair.

Usage:
  python scripts/scan_dataset.py --config-base ... --config-file ... \
      [--mode train] [--samples 200] [--strict]

Exits non-zero in --strict mode if any sampled image exceeds the cap.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-base", default=None)
    p.add_argument("--config-file", required=True)
    p.add_argument("--mode", default="train")
    p.add_argument("--samples", type=int, default=200,
                   help="augmented samples to draw (train mode re-crops)")
    p.add_argument("--strict", action="store_true")
    p.add_argument("--opts", nargs="*", default=[])
    args = p.parse_args()

    from pctrans_tpu.config import load_cfg
    from pctrans_tpu.data.build import get_dataset

    cfg = load_cfg(args.config_base, args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cap = int(cfg.MODEL.MAX_INSTANCES)
    ds = get_dataset(cfg, args.mode)

    rng = np.random.RandomState(0)
    counts = []
    n = min(args.samples, len(ds) if args.mode != "train" else args.samples)
    for k in range(n):
        idx = k % len(ds)
        try:
            item = ds.__getitem__(idx, rng=np.random.RandomState(rng.randint(2**31)))
        except TypeError:
            item = ds[idx]
        counts.append(int(np.max(item["label"])))
    counts = np.asarray(counts)
    print(f"dataset={cfg.DATASET.DATA_TYPE} mode={args.mode} "
          f"samples={n} cap={cap}")
    print(f"instance count: max={counts.max()} p99={np.percentile(counts, 99):.0f} "
          f"mean={counts.mean():.1f}")
    over = int((counts > cap).sum())
    print(f"images over MODEL.MAX_INSTANCES: {over}/{n}")
    if over and args.strict:
        sys.exit(f"FAIL: {over} sampled image(s) exceed MAX_INSTANCES={cap}")


if __name__ == "__main__":
    main()
