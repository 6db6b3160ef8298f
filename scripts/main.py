"""Train / inference dispatcher.

Equivalent of the reference scripts/main.py:12-65: merge configs, build the
Trainer, dispatch by DATASET.DATA_TYPE and --inference.  ``--distributed``
(or RANK/WORLD_SIZE/MASTER_ADDR env, the same env:// convention as the
reference's ``torch.distributed.launch``, utils/system.py:53-84) performs
the multi-host ``jax.distributed.initialize`` rendezvous; after it, the one
mesh program spans every process's devices and each host feeds its local
shard of the global batch (parallel/mesh.py).

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
                   help="multi-host: run jax.distributed.initialize from "
                        "RANK/WORLD_SIZE/MASTER_ADDR:MASTER_PORT (or "
                        "COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID) env "
                        "vars; single-host mesh runs never need this")
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
    if args.distributed or "COORDINATOR_ADDRESS" in os.environ:
        from pctrans_tpu.parallel import initialize_distributed

        rank = initialize_distributed()
        print(f"[distributed] process {rank} up")
    cfg = load_cfg(args.config_base, args.config_file, args.opts, freeze=False)
    if args.inference:
        cfg = update_inference_cfg(cfg)
    cfg.freeze()

    t0 = time.time()
    mode = "test" if args.inference else "train"

    # legacy EM path (volumetric data + legacy zoo): LegacyTrainer with
    # optional chunked TileDataset orchestration (reference main.py routes
    # these through the same Trainer; see engine/legacy_trainer.py)
    if cfg.DATASET.DATA_TYPE in ("volume", "tile"):
        from pctrans_tpu.engine.legacy_trainer import LegacyTrainer

        trainer = LegacyTrainer(cfg, mode=mode, checkpoint=args.checkpoint)
        if cfg.DATASET.DO_CHUNK_TITLE == 1:
            trainer.run_chunk(mode)
        elif mode == "train":
            trainer.train()
        else:
            trainer.test()
        trainer.close()
        print(f"Total runtime: {time.time() - t0:.1f}s")
        return

    from pctrans_tpu.engine.trainer import Trainer

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
