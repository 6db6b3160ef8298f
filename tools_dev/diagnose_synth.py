"""Diagnose the synthetic-CVPPP SBD plateau (~0.7).

Separates three hypotheses for a trained checkpoint:
  (a) generalization gap  -> train-set SBD >> val-set SBD
  (b) raw mask quality    -> per-GT-instance best dice over RAW thresholded
                             query masks (before clustering/NMS/painting)
  (c) postprocess cap     -> SBD from the full instance_inference_cvppp
                             pipeline vs the raw best-dice ceiling

Usage:
  python tools_dev/diagnose_synth.py outputs/synth_cvppp_v2/checkpoint_006000 \
      [--opts MODEL.PIXEL_STD [1.0,1.0,1.0] MODEL.RESNETS.NORM BN]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pctrans_tpu.config import load_cfg  # noqa: E402
from pctrans_tpu.data.synthetic import SyntheticDataset  # noqa: E402
from pctrans_tpu.engine.trainer import Trainer  # noqa: E402
from pctrans_tpu.inference import metrics_cvppp as mc  # noqa: E402
from pctrans_tpu.inference.postprocess import instance_inference_cvppp  # noqa: E402


def best_dice_per_gt(probs: np.ndarray, gt: np.ndarray, thr: float = 0.69):
    """For each GT instance, the best dice over raw thresholded query masks."""
    masks = probs > thr  # [K, H, W]
    out = []
    for gid in np.unique(gt):
        if gid == 0:
            continue
        g = gt == gid
        inter = (masks & g).sum(axis=(1, 2))
        dice = 2 * inter / np.maximum(masks.sum(axis=(1, 2)) + g.sum(), 1)
        out.append(float(dice.max()) if len(dice) else 0.0)
    return out


def eval_split(trainer, ds, name):
    sbd_post, sbd_raw, dic = [], [], []
    n_pred, n_gt = [], []
    B = 8
    imgs = np.stack([ds[i]["image"] for i in range(B)])
    gts = np.stack([ds[i]["label"] for i in range(B)])
    probs = trainer.predict_probs(imgs)
    for b in range(B):
        seg = instance_inference_cvppp(np.asarray(probs[b])).astype(np.uint16)
        gt = gts[b].astype(np.uint16)
        sbd_post.append(mc.SymmetricBestDice(seg, gt))
        bd = best_dice_per_gt(np.asarray(probs[b]), gt)
        sbd_raw.append(float(np.mean(bd)) if bd else 0.0)
        dic.append(int(seg.max()) - int(gt.max()))
        n_pred.append(int(seg.max()))
        n_gt.append(int(gt.max()))
    print(f"[{name}] SBD(post)={np.mean(sbd_post):.4f}  "
          f"bestDice(raw,GT-dir)={np.mean(sbd_raw):.4f}  "
          f"DiC={np.mean(dic):+.2f}  n_pred={n_pred}  n_gt={n_gt}")
    print(f"        per-image SBD: {[f'{s:.3f}' for s in sbd_post]}")
    return np.mean(sbd_post)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--opts", nargs="*", default=[])
    args = p.parse_args()

    cfg = load_cfg(
        os.path.join(REPO, "configs/CVPPP/CVPPP-PCTrans-Base.yaml"),
        os.path.join(REPO, "configs/CVPPP/CVPPP-PCTrans.yaml"),
        opts=["DATASET.DATA_TYPE", "synthetic",
              "DATASET.OUTPUT_PATH", "outputs/diag",
              *args.opts],
    )
    trainer = Trainer(cfg, mode="test", checkpoint=args.checkpoint)
    size = tuple(cfg.MODEL.INPUT_SIZE[-2:])
    train_ds = SyntheticDataset(size=size, length=64, seed=0)
    val_ds = SyntheticDataset(size=size, length=8, seed=1)
    eval_split(trainer, train_ds, "train(seen)")
    eval_split(trainer, val_ds, "val (held-out)")


if __name__ == "__main__":
    main()
