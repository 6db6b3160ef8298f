"""Legacy EM benchmark evaluation CLI.

One entry point replacing the reference's per-dataset scripts
(inference/evaluation/evaluate_snemi.py, evaluate_snemi2d.py,
evaluate_epfl.py, evaluate_mito.py, eval_syn.py):

  python scripts/eval_em.py --mode instance -p pred.h5 -g gt.h5
      VOI split/merge + adapted Rand error (SNEMI/CREMI instance protocol)
  python scripts/eval_em.py --mode synapse -p pred.h5 -g gt.h5
      CREMI synaptic-cleft distance scores (FP/FN rate, F1, ADGT/ADF/CRIME)
  python scripts/eval_em.py --mode binary -p prob.h5 -g gt.h5 --thres 0.5
      foreground IoU / mIoU / precision / recall (EPFL/mito protocol)
  python scripts/eval_em.py --mode ap3d -p pred.h5 -g gt.h5
      COCO-style 3D instance AP (AP-75 / AP-50 / averaged)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pctrans_tpu.data.volume_io import readvol
from pctrans_tpu.inference.eval_em import (
    eval_binary_volume, eval_instance_volume, eval_synapse,
)


def main():
    p = argparse.ArgumentParser(description="EM benchmark evaluation")
    p.add_argument("--mode", choices=["instance", "synapse", "binary", "ap3d"],
                   default="instance")
    p.add_argument("-p", "--prediction", required=True)
    p.add_argument("-g", "--groundtruth", required=True)
    p.add_argument("--thres", type=float, nargs="+", default=[0.5])
    p.add_argument("--output-txt", default=None)
    args = p.parse_args()

    pred = readvol(args.prediction)
    gt = readvol(args.groundtruth)

    if args.mode == "instance":
        vs, vm, vsum, arand = eval_instance_volume(
            gt, pred, output_txt=args.output_txt,
            tag=os.path.basename(args.prediction))
        print(f"voi_split={vs:.6f}, voi_merge={vm:.6f}, "
              f"voi_sum={vsum:.6f}, arand={arand:.6f}")
    elif args.mode == "synapse":
        # the 128/255 threshold assumes a uint8 prediction; rescale float
        # probability volumes like binary mode does (a [0, 1] float would
        # otherwise binarize to all-background and score silent garbage)
        if pred.max() <= 1.5:
            pred = (pred.astype(np.float32) * 255.0)
        for k, v in eval_synapse(pred, gt).items():
            print(f"\t{k}: {v:.4f}")
    elif args.mode == "binary":
        prob = pred.astype(np.float32)
        if prob.max() > 1.5:
            prob = prob / 255.0
        for t, row in zip(args.thres,
                          eval_binary_volume(prob, gt, tuple(args.thres))):
            print(f"thres={t}: iou_fg={row[0]:.4f} miou={row[1]:.4f} "
                  f"precision={row[2]:.4f} recall={row[3]:.4f}")
    else:
        from pctrans_tpu.inference.vol3d_ap import evaluate_ap

        ap75, ap50, avap, _ = evaluate_ap(pred, gt)
        print(f"AP-75={ap75:.4f} AP-50={ap50:.4f} averaged-AP={avap:.4f}")


if __name__ == "__main__":
    main()
