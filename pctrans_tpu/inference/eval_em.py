"""Legacy EM benchmark evaluation wrappers.

Consolidates the reference's per-dataset evaluation scripts
(inference/evaluation/: ``evaluate_snemi.py``:6-21, ``evaluate_snemi2d.py``,
``evaluate_epfl.py``, ``evaluate_mito.py``, ``eval_syn.py``:6-48) into one
module on top of the shared metric implementations in
:mod:`~pctrans_tpu.inference.metrics_em` and
:mod:`~pctrans_tpu.inference.vol3d_ap`.  The reference scripts are argparse
CLIs around skimage's adapted-rand/VOI (absent here) plus the CREMI
synaptic-cleft distance scores; ``scripts/eval_em.py`` is the CLI face.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from scipy import ndimage

from .metrics_em import adapted_rand, get_binary_jaccard, voi


def eval_instance_volume(gt_seg: np.ndarray, pred_seg: np.ndarray,
                         output_txt: Optional[str] = None,
                         tag: str = "") -> Tuple[float, float, float, float]:
    """(voi_split, voi_merge, voi_sum, adapted_rand_error): the SNEMI /
    EPFL / mito protocol (evaluate_snemi.py:6-21 — skimage's
    ``adapted_rand_error`` / ``variation_of_information`` with background
    ignored, here via the shared numpy implementations)."""
    voi_split, voi_merge = voi(pred_seg, gt_seg)
    arand = adapted_rand(pred_seg, gt_seg)
    if output_txt is not None:
        with open(output_txt, "a") as f:
            f.write(f"{tag}\n{voi_split} {voi_merge} "
                    f"{voi_split + voi_merge} {arand}\n")
    return float(voi_split), float(voi_merge), \
        float(voi_split + voi_merge), float(arand)


class CleftsEval:
    """CREMI synaptic-cleft scores (eval_syn.py:6-48): distance transforms
    of the complement masks at anisotropic resolution; a predicted cleft
    voxel further than ``threshold`` nm from any true cleft is a false
    positive (and symmetrically for false negatives); ADGT/ADF are the mean
    distances and CRIME their average."""

    def __init__(self, test: np.ndarray, truth: np.ndarray,
                 resolution: Tuple[float, float, float] = (40.0, 4.0, 4.0)):
        self.test_fg = test != 0
        self.truth_fg = truth != 0
        self.truth_edt = ndimage.distance_transform_edt(
            ~self.truth_fg, sampling=resolution)
        self.test_edt = ndimage.distance_transform_edt(
            ~self.test_fg, sampling=resolution)

    def count_false_positives(self, threshold: float = 200.0) -> int:
        return int((self.test_fg & (self.truth_edt > threshold)).sum())

    def count_false_negatives(self, threshold: float = 200.0) -> int:
        return int((self.truth_fg & (self.test_edt > threshold)).sum())

    def acc_false_positives(self) -> float:
        n = self.test_fg.sum()
        return float((self.truth_edt * self.test_fg).sum() / max(n, 1))

    def acc_false_negatives(self) -> float:
        n = self.truth_fg.sum()
        return float((self.test_edt * self.truth_fg).sum() / max(n, 1))

    def summary(self, threshold: float = 200.0) -> Dict[str, float]:
        total = float(np.prod(self.test_fg.shape))
        fpr = self.count_false_positives(threshold) / total
        fnr = self.count_false_negatives(threshold) / total
        # reference quirk preserved (eval_syn.py:80-82): tpr = 1 - FN/total
        # counts every background voxel as a true positive, so 'f1'
        # saturates near 1 on sparse cleft volumes (clefts ~1% of a CREMI
        # volume -> an all-empty prediction scores f1 ~ 0.995).  'f1_fg'
        # normalizes by the truth foreground instead and is the honest
        # detection score.
        tpr = 1.0 - fnr
        f1 = 2 * tpr / (2 * tpr + fpr + fnr)
        n_truth = float(self.truth_fg.sum())
        tp_fg = max(n_truth - self.count_false_negatives(threshold), 0.0)
        fp = float(self.count_false_positives(threshold))
        fn = float(self.count_false_negatives(threshold))
        f1_fg = (2 * tp_fg / (2 * tp_fg + fp + fn)
                 if (tp_fg + fp + fn) > 0 else 0.0)
        adgt = self.acc_false_positives()
        adf = self.acc_false_negatives()
        return {"false_positive_rate": fpr, "false_negative_rate": fnr,
                "f1": f1, "f1_fg": f1_fg, "ADGT": adgt, "ADF": adf,
                "CRIME_score": (adgt + adf) / 2.0}


def eval_synapse(pred: np.ndarray, truth: np.ndarray,
                 pred_thres: int = 128) -> Dict[str, float]:
    """eval_syn.py main: binarize the prediction at 128/255, non-zero GT is
    cleft, report the CREMI score block."""
    test = (pred >= pred_thres).astype(np.uint8)
    return CleftsEval(test, (truth != 0).astype(np.uint8)).summary()


def eval_binary_volume(pred_prob: np.ndarray, gt: np.ndarray,
                       thres=(0.5,)) -> np.ndarray:
    """Foreground IoU / mIoU / precision / recall at thresholds (the
    mito/EPFL semantic protocol; evaluate.py:374-402)."""
    return get_binary_jaccard(pred_prob, (gt > 0).astype(np.uint8), thres)
