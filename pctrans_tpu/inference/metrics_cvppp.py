"""CVPPP leaf-segmentation metrics: BestDice / SBD / |DiC|.

Semantics follow the reference Cython suite (lib/evaluate/CVPPP_evaluate.pyx:
Dice:113, BestDice:45, SymmetricBestDice:147, DiffFGLabels:25,
AbsDiffFGLabels:136, FGBGDice:91) but are computed from a single
label-pair contingency table instead of O(n_in * n_gt) full-image passes:
the reference's nested loops are O(n_in * n_gt * H * W); this is O(H * W).

Key behavioral details preserved:
* labels are assumed consecutive; the *lowest* label in each image is
  treated as background and skipped;
* absent intermediate label values still count in the BestDice denominator
  (they contribute a best dice of 0);
* SBD = min(BestDice(in, gt), BestDice(gt, in));
* DiffFGLabels = (max(in)-min(in)) - (max(gt)-min(gt)).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _contingency(in_label: np.ndarray, gt_label: np.ndarray):
    """Joint histogram of (in, gt) label pairs plus marginal sizes."""
    in_label = np.asarray(in_label).ravel().astype(np.int64)
    gt_label = np.asarray(gt_label).ravel().astype(np.int64)
    n_in = int(in_label.max()) + 1
    n_gt = int(gt_label.max()) + 1
    joint = np.bincount(in_label * n_gt + gt_label, minlength=n_in * n_gt)
    joint = joint.reshape(n_in, n_gt).astype(np.float64)
    return joint, joint.sum(axis=1), joint.sum(axis=0)


def _pairwise_dice(in_label: np.ndarray, gt_label: np.ndarray):
    """dice[i, j] = 2|in==i & gt==j| / (|in==i| + |gt==j|) for all label pairs."""
    joint, size_in, size_gt = _contingency(in_label, gt_label)
    denom = size_in[:, None] + size_gt[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        dice = np.where(denom > 1e-8, 2.0 * joint / np.maximum(denom, 1e-12), 0.0)
    return dice


def _best_dice_from(dice: np.ndarray, in_label: np.ndarray,
                    gt_label: np.ndarray) -> float:
    """BestDice given a precomputed dice[in, gt] matrix (reference row/col
    range semantics: labels min+1..max of each map count as foreground)."""
    max_in, min_in = int(in_label.max()), int(in_label.min())
    max_gt, min_gt = int(gt_label.max()), int(gt_label.min())
    if max_in == min_in:  # trivial solution: only background predicted
        return 0.0
    rows = np.arange(min_in + 1, max_in + 1)
    cols = np.arange(min_gt + 1, max_gt + 1)
    if len(cols) == 0:
        best = np.zeros(len(rows))
    else:
        sub = dice[np.ix_(rows, cols)]
        best = sub.max(axis=1)
    return float(best.sum() / (max_in - min_in))


def BestDice(in_label: np.ndarray, gt_label: np.ndarray) -> float:
    """Mean over foreground in-labels of the best dice vs any foreground gt label."""
    in_label = np.asarray(in_label)
    gt_label = np.asarray(gt_label)
    return _best_dice_from(_pairwise_dice(in_label, gt_label), in_label, gt_label)


def SymmetricBestDice_both(in_label: np.ndarray, gt_label: np.ndarray) -> Tuple[float, float]:
    # one contingency pass serves both directions (the reverse dice matrix
    # is the transpose)
    in_label = np.asarray(in_label)
    gt_label = np.asarray(gt_label)
    dice = _pairwise_dice(in_label, gt_label)
    bd1 = _best_dice_from(dice, in_label, gt_label)
    bd2 = _best_dice_from(dice.T, gt_label, in_label)
    return min(bd1, bd2), max(bd1, bd2)


def SymmetricBestDice(in_label: np.ndarray, gt_label: np.ndarray) -> float:
    return SymmetricBestDice_both(in_label, gt_label)[0]


def SymmetricBestDice_max(in_label: np.ndarray, gt_label: np.ndarray) -> float:
    return SymmetricBestDice_both(in_label, gt_label)[1]


def DiffFGLabels(in_label: np.ndarray, gt_label: np.ndarray) -> float:
    in_label = np.asarray(in_label)
    gt_label = np.asarray(gt_label)
    return float(
        (int(in_label.max()) - int(in_label.min()))
        - (int(gt_label.max()) - int(gt_label.min()))
    )


def AbsDiffFGLabels(in_label: np.ndarray, gt_label: np.ndarray) -> float:
    return abs(DiffFGLabels(in_label, gt_label))


def FGBGDice(in_label: np.ndarray, gt_label: np.ndarray) -> float:
    in_label = np.asarray(in_label)
    gt_label = np.asarray(gt_label)
    in_fg = (in_label != in_label.min()).astype(np.uint8)
    gt_fg = (gt_label != gt_label.min()).astype(np.uint8)
    inter = float(np.sum(in_fg & gt_fg))
    denom = float(in_fg.sum() + gt_fg.sum())
    return 2.0 * inter / denom if denom > 1e-8 else 0.0
