"""Checkpoint-sweep evaluation harness.

Equivalent of the reference scripts/eval.py:89-122, which re-launched a
fresh OS process per checkpoint; here the model is built once and each
checkpoint is restored in-process (orbax), so the sweep amortizes the jit
compile across all checkpoints.

Usage:
  python scripts/eval.py --config-base ... --config-file ... --name cvppp
      [--start 51000] [--opts ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pctrans_tpu.config import load_cfg, update_inference_cfg


def get_args():
    p = argparse.ArgumentParser(description="sweep checkpoints")
    p.add_argument("--config-base", type=str, default=None)
    p.add_argument("--config-file", type=str, default=None)
    p.add_argument("--name", type=str, default="cvppp")
    p.add_argument("--start", type=int, default=51000,
                   help="first checkpoint iteration to evaluate")
    p.add_argument("--out", type=str, default=None,
                   help="write the sweep as a JSON list of "
                        "{iter, **metrics} records")
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = get_args()
    cfg = load_cfg(args.config_base, args.config_file, args.opts, freeze=False)
    # reference semantics (scripts/eval.py:103-104): checkpoints come from
    # the TRAINING output path (model_dir = cfg.DATASET.OUTPUT_PATH read
    # BEFORE inference overrides); INFERENCE.OUTPUT_PATH only receives the
    # sweep records. The inference overrides apply to the eval run itself.
    model_dir = cfg.DATASET.OUTPUT_PATH
    cfg = update_inference_cfg(cfg)
    cfg.freeze()

    from pctrans_tpu.engine import checkpoint as ckpt
    from pctrans_tpu.engine.trainer import Trainer

    trainer = Trainer(cfg, mode="test")
    sweep = [
        c for c in ckpt.list_checkpoints(model_dir)
        if ckpt.checkpoint_iteration(c) >= args.start
    ]
    if not sweep:
        print(f"No checkpoints >= iter {args.start} in {model_dir}")
        return
    from pctrans_tpu.parallel import replicate

    records = []
    for path in sweep:
        # restore, then explicitly re-replicate over the mesh: orbax restores
        # with whatever sharding the checkpoint recorded, which may not match
        # the eval mesh (e.g. a 4-device training run swept on 1 device)
        trainer.state = replicate(
            trainer.mesh, ckpt.restore_checkpoint(path, trainer.state))
        name = os.path.basename(path)
        if args.name == "bbbc" or cfg.DATASET.DATA_TYPE in ("BBBC",
                                                            "synthetic_bbbc"):
            res = trainer.test_bbbc(model_name=name)
        else:
            res = trainer.eval_cvppp(model_name=name)
        print(name, res)
        records.append({"iter": ckpt.checkpoint_iteration(path),
                        **{k: float(v) for k, v in res.items()}})

    if args.out:
        import json
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)
        print(f"wrote {args.out} ({len(records)} records)")


if __name__ == "__main__":
    main()
