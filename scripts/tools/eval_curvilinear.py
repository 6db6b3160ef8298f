"""Curvilinear structure evaluation CLI (CCQ + foreground IoU).

Equivalent of the reference ``scripts/tools/eval_curvilinear.py``: walks
``{pd_path}%03d_pred.png`` / ``{gt_path}%03d.png`` pairs, binarizes
(prediction at ``--thres``, GT as nonzero-and-not-255), and reports the
per-image mean of (foreground IoU, correctness, completeness, quality)
via a multiprocessing pool.  Metric implementations (including the
skeletonization skimage provided there) live in
``pctrans_tpu.inference.curvilinear``.
"""

import argparse
import multiprocessing
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from pctrans_tpu.inference.curvilinear import evaluate_pair


def get_args():
    parser = argparse.ArgumentParser(
        description="Curvilinear structure evaluation.")
    parser.add_argument("--gt-path", type=str,
                        help="path prefix of ground-truth masks")
    parser.add_argument("--pd-path", type=str,
                        help="path prefix of predicted structures")
    parser.add_argument("--thres", type=int, default=128,
                        help="threshold for prediction [0, 255]")
    parser.add_argument("--max-index", type=int, default=200,
                        help="maximum image index")
    return parser.parse_args()


def _read(path):
    import imageio

    return np.asarray(imageio.imread(path))


def evaluate(args_i):
    args, i = args_i
    pd_file = args.pd_path + "%03d_pred.png" % i
    gt_file = args.gt_path + "%03d.png" % i
    if not os.path.exists(pd_file):
        return None
    res = evaluate_pair(_read(pd_file), _read(gt_file), thres=args.thres)
    print(i, *res, flush=True)
    return res


def main():
    args = get_args()
    print(args)
    num_cores = multiprocessing.cpu_count()
    print("num_cores: ", num_cores)
    with multiprocessing.Pool(num_cores) as p:
        results = p.map(evaluate, [(args, i) for i in range(args.max_index)])
    results = np.array([r for r in results if r is not None])
    print(results.shape[0], results.mean(0))


if __name__ == "__main__":
    main()
