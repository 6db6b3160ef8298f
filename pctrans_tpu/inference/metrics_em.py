"""Legacy EM evaluation metrics: adapted Rand, variation of information,
binary Jaccard.

Equivalents of the reference ``connectomics/utils/evaluate.py``:
``adapted_rand``:11 (SNEMI3D 1 - Rand-F-score, zero GT label excluded),
``voi``:81 / ``split_vi``:118 (conditional entropies H(X|Y), H(Y|X) over the
label contingency table, gala-style with ignored labels), ``confusion_matrix``
:364 and ``get_binary_jaccard``:374.  The contingency table is accumulated
SPARSELY (unique label pairs + counts), like the reference's scipy.sparse
path: a routine connectomics eval with ~30k GT x ~30k predicted instances
would need a ~7 GB dense table whose entries are overwhelmingly zero.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _contingency_pairs(seg: np.ndarray, gt: np.ndarray):
    """Sparse contingency: unique (gt, seg) label pairs with voxel counts.

    Labels are remapped to consecutive ids (0 stays 0; a guaranteed 0 row
    and column keeps background semantics even when absent).  Returns
    (rows, cols, counts, gt_ids, seg_ids): counts[k] voxels have the
    gt_ids[rows[k]] / seg_ids[cols[k]] label pair.  Memory is O(distinct
    pairs) — the reference used scipy.sparse for the same reason
    (evaluate.py:52); a dense [n_gt, n_seg] table is ~7 GB at a routine
    30k x 30k connectomics eval.
    """
    seg = np.ravel(seg).astype(np.int64)
    gt = np.ravel(gt).astype(np.int64)
    gt_ids, gt = np.unique(np.concatenate([[0], gt]), return_inverse=True)
    seg_ids, seg = np.unique(np.concatenate([[0], seg]), return_inverse=True)
    gt, seg = gt[1:], seg[1:]
    n_b = len(seg_ids)
    pairs, counts = np.unique(gt * n_b + seg, return_counts=True)
    return (pairs // n_b, pairs % n_b, counts.astype(np.float64),
            gt_ids, seg_ids)


def adapted_rand(seg: np.ndarray, gt: np.ndarray, all_stats: bool = False):
    """Adapted Rand error (evaluate.py:11-78): 1 - F-score of the Rand index
    with the zero GT component excluded; the reference's quirk of adding
    ``sum(gt>0 & seg==0) / n`` to both the B- and AB-sums is preserved."""
    n = gt.size
    rows, cols, cnt, gt_ids, seg_ids = _contingency_pairs(seg, gt)
    fg = rows > 0                         # GT foreground pairs
    both = fg & (cols > 0)                # both foreground
    # a_i: per-GT-row sums over ALL seg labels; b_i: per-seg-col sums over
    # GT-foreground rows and seg-foreground cols; c: GT fg -> seg bg voxels
    a_i = np.bincount(rows[fg], weights=cnt[fg], minlength=len(gt_ids))[1:]
    b_i = np.bincount(cols[both], weights=cnt[both],
                      minlength=len(seg_ids))[1:]
    c_sum = float(cnt[fg & (cols == 0)].sum())
    sum_a = float((a_i * a_i).sum())
    sum_b = float((b_i * b_i).sum()) + c_sum / n
    sum_ab = float((cnt[both] ** 2).sum()) + c_sum / n

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
    # rows: y labels, cols: x labels.  Ignored labels are RAW label values
    # (gala/reference semantics) translated to remapped rows/cols — indexing
    # the remapped table by raw value silently ignored the wrong label.
    rows, cols, cnt, y_ids, x_ids = _contingency_pairs(x, y)
    keep = (~np.isin(y_ids[rows], np.asarray(list(ignore_y), np.int64))
            & ~np.isin(x_ids[cols], np.asarray(list(ignore_x), np.int64)))
    rows, cols, cnt = rows[keep], cols[keep], cnt[keep]
    total = cnt.sum()
    if total == 0:
        return 0.0, 0.0
    pv = cnt / total
    px = np.bincount(cols, weights=pv, minlength=len(x_ids))
    py = np.bincount(rows, weights=pv, minlength=len(y_ids))
    hxy = -float(_xlogx(pv).sum() - _xlogx(px).sum())  # H(Y|X)
    hyx = -float(_xlogx(pv).sum() - _xlogx(py).sum())  # H(X|Y)
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
