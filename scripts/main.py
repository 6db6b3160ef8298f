"""Train / inference dispatcher.

Equivalent of the reference scripts/main.py:12-65: merge configs, build the
Trainer, dispatch by DATASET.DATA_TYPE and --inference.  There is no
torch.distributed.launch equivalent to wire up — one process drives the
whole mesh (multi-host would call jax.distributed.initialize here).

Usage:
  python scripts/main.py --config-base configs/CVPPP/CVPPP-PCTrans-Base.yaml \
      --config-file configs/CVPPP/CVPPP-PCTrans.yaml [--inference]
      [--checkpoint PATH] [--opts KEY VALUE ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pctrans_tpu.config import load_cfg, update_inference_cfg


def get_args():
    p = argparse.ArgumentParser(description="PCTrans-TPU training / inference")
    p.add_argument("--config-base", type=str, default=None)
    p.add_argument("--config-file", type=str, default=None)
    p.add_argument("--inference", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="kept for CLI compatibility; the mesh is always used")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--submission", action="store_true",
                   help="CVPPP: run the official test set and write the "
                        "CodaLab submission.h5 (reference test_cvppp) "
                        "instead of the val-split eval")
    p.add_argument("--local_rank", type=int, default=None)
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = get_args()
    cfg = load_cfg(args.config_base, args.config_file, args.opts, freeze=False)
    if args.inference:
        cfg = update_inference_cfg(cfg)
    cfg.freeze()

    from pctrans_tpu.engine.trainer import Trainer

    t0 = time.time()
    mode = "test" if args.inference else "train"
    trainer = Trainer(cfg, mode=mode, checkpoint=args.checkpoint)

    if not args.inference:
        trainer.train()
    else:
        name = os.path.basename(args.checkpoint or "model")
        dt = cfg.DATASET.DATA_TYPE
        if dt in ("CVPPP", "synthetic"):
            if args.submission:
                print(trainer.test_cvppp())
            else:
                print(trainer.eval_cvppp(model_name=name))
        elif dt == "BBBC":
            print(trainer.test_bbbc(model_name=name))
        else:
            raise ValueError(f"No inference path for DATA_TYPE={dt}")
    print(f"Total runtime: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
