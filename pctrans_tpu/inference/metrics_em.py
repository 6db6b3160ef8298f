"""Legacy EM evaluation metrics: adapted Rand, variation of information,
binary Jaccard.

Equivalents of the reference ``connectomics/utils/evaluate.py``:
``adapted_rand``:11 (SNEMI3D 1 - Rand-F-score, zero GT label excluded),
``voi``:81 / ``split_vi``:118 (conditional entropies H(X|Y), H(Y|X) over the
label contingency table, gala-style with ignored labels), ``confusion_matrix``
:364 and ``get_binary_jaccard``:374.  All are contingency-table computations
on flattened label volumes — pure numpy, no sparse-matrix scaffolding.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _contingency(seg: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Dense contingency counts [n_gt_labels, n_seg_labels].

    Labels are remapped to consecutive ids first (0 stays 0), so the table
    is bounded by the number of DISTINCT labels — sparse/24-bit id volumes
    (e.g. vast2Seg outputs) would otherwise demand a (max_id+1)^2 table
    (the reference used scipy.sparse for the same reason, evaluate.py:52).
    Callers receive rows/cols indexed by the remapped ids, which is
    invariant for every metric here (they only use counts).
    """
    seg = np.ravel(seg).astype(np.int64)
    gt = np.ravel(gt).astype(np.int64)
    gt_ids, gt = np.unique(np.concatenate([[0], gt]), return_inverse=True)
    seg_ids, seg = np.unique(np.concatenate([[0], seg]), return_inverse=True)
    gt, seg = gt[1:], seg[1:]
    n_a, n_b = len(gt_ids), len(seg_ids)
    flat = gt * n_b + seg
    return np.bincount(flat, minlength=n_a * n_b).reshape(n_a, n_b)


def adapted_rand(seg: np.ndarray, gt: np.ndarray, all_stats: bool = False):
    """Adapted Rand error (evaluate.py:11-78): 1 - F-score of the Rand index
    with the zero GT component excluded; the reference's quirk of adding
    ``sum(gt>0 & seg==0) / n`` to both the B- and AB-sums is preserved."""
    n = gt.size
    p = _contingency(seg, gt).astype(np.float64)
    a = p[1:, :]              # GT foreground rows, all seg labels
    b = p[1:, 1:]             # both foreground
    c = p[1:, 0]              # GT foreground predicted background

    a_i = a.sum(1)
    b_i = b.sum(0)
    sum_a = float((a_i * a_i).sum())
    sum_b = float((b_i * b_i).sum()) + c.sum() / n
    sum_ab = float((b * b).sum()) + c.sum() / n

    precision = sum_ab / sum_b
    recall = sum_ab / sum_a
    f = 2.0 * precision * recall / (precision + recall)
    return (1.0 - f, precision, recall) if all_stats else 1.0 - f


def _xlogx(x: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x, dtype=np.float64)
    nz = x > 0
    out[nz] = x[nz] * np.log2(x[nz])
    return out


def split_vi(x: np.ndarray, y: np.ndarray,
             ignore_x: Sequence[int] = (0,),
             ignore_y: Sequence[int] = (0,)) -> Tuple[float, float]:
    """(H(Y|X), H(X|Y)) — the false-split / false-merge conditional
    entropies (evaluate.py:118-152).  Ignored labels' voxels are dropped
    from the joint distribution (norm over the remainder)."""
    p = _contingency(x, y).astype(np.float64)  # rows: y labels, cols: x labels
    for iy in ignore_y:
        if iy < p.shape[0]:
            p[iy, :] = 0
    for ix in ignore_x:
        if ix < p.shape[1]:
            p[:, ix] = 0
    total = p.sum()
    if total == 0:
        return 0.0, 0.0
    p = p / total
    px = p.sum(0)   # marginal over x labels
    py = p.sum(1)   # marginal over y labels
    hxy = -float(_xlogx(p).sum() - _xlogx(px).sum())  # H(Y|X)
    hyx = -float(_xlogx(p).sum() - _xlogx(py).sum())  # H(X|Y)
    return hxy, hyx


def voi(reconstruction: np.ndarray, groundtruth: np.ndarray,
        ignore_reconstruction: Sequence[int] = (),
        ignore_groundtruth: Sequence[int] = (0,)) -> Tuple[float, float]:
    """(split, merge) VI = (H(X|Y), H(Y|X)) with X the reconstruction
    (evaluate.py:81-116)."""
    hyxg, hxgy = split_vi(reconstruction, groundtruth,
                          ignore_reconstruction, ignore_groundtruth)
    return hxgy, hyxg


def confusion_matrix(pred: np.ndarray, gt: np.ndarray, thres: float = 0.5):
    """(TP, FP, TN, FN) at a probability threshold (evaluate.py:364-372)."""
    tp = int(np.sum((gt == 1) & (pred > thres)))
    fp = int(np.sum((gt == 0) & (pred > thres)))
    tn = int(np.sum((gt == 0) & (pred <= thres)))
    fn = int(np.sum((gt == 1) & (pred <= thres)))
    return tp, fp, tn, fn


def get_binary_jaccard(pred: np.ndarray, gt: np.ndarray,
                       thres: Sequence[float] = (0.5,)) -> np.ndarray:
    """[N, 4] of (foreground IoU, mean IoU, precision, recall) per threshold
    (evaluate.py:374-402)."""
    score = np.zeros((len(thres), 4))
    for tid, t in enumerate(thres):
        assert 0.0 < t < 1.0
        tp, fp, tn, fn = confusion_matrix(pred, gt, t)
        # empty prediction/GT at this threshold scores 0, not a crash
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        iou_fg = tp / max(tp + fp + fn, 1)
        iou_bg = tn / max(tn + fp + fn, 1)
        score[tid] = [iou_fg, (iou_fg + iou_bg) / 2.0, precision, recall]
    return score
