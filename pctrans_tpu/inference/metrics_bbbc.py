"""BBBC039 nuclei metrics: aggregated Jaccard (AJI), pixel F1, fast PQ.

Semantics follow the reference implementations
(connectomics/inference/evaluation/metrics_bbbc.py: agg_jc_index:11,
pixel_f1:72, get_fast_pq:120, remap_label:216) including their matching
quirks, but all pixel work is reduced to one contingency-table pass.

AJI quirk preserved: the reference greedily matches each GT instance (in id
order) to the prediction with the best IoU *treating already-used predictions
as zero-intersection / union=|gt|*; when every candidate IoU is zero the
argmax still "uses up" the first prediction id.  Unused predictions are added
to the union at the end.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def _contingency(gt: np.ndarray, pred: np.ndarray):
    """Joint (gt, pred) label histogram — one shared builder with the CVPPP
    metrics (rows = first argument's labels)."""
    from .metrics_cvppp import _contingency as _contingency3

    return _contingency3(gt, pred)[0]


def remap_label(pred: np.ndarray, by_size: bool = False) -> np.ndarray:
    """Relabel instances to contiguous ids 1..K (0 stays background)."""
    pred = np.asarray(pred)
    ids = np.unique(pred)
    ids = ids[ids != 0]
    if ids.size == 0:
        return pred
    if by_size:
        sizes = np.array([(pred == i).sum() for i in ids])
        ids = ids[np.argsort(-sizes, kind="stable")]
    new_pred = np.zeros(pred.shape, np.int32)
    for new_id, inst_id in enumerate(ids, start=1):
        new_pred[pred == inst_id] = new_id
    return new_pred


def agg_jc_index(gt_ins: np.ndarray, pred: np.ndarray) -> float:
    """Aggregated Jaccard index.

    ``gt_ins`` and ``pred`` are instance label maps with contiguous ids
    (call :func:`remap_label` first, as the reference eval loop does at
    connectomics/engine/trainer.py:539-542).
    """
    gt_ins = np.asarray(gt_ins)
    pred = np.asarray(pred)
    n_gt = int(gt_ins.max())
    n_pred = int(pred.max())
    if n_gt == 0:
        return 0.0

    joint = _contingency(gt_ins, pred)  # [n_gt+1, n_pred+1]
    gt_sizes = joint.sum(axis=1)
    pred_sizes = joint.sum(axis=0)

    used = np.zeros(n_pred + 1, dtype=bool)
    c = 0.0
    u = 0.0
    for g in range(1, n_gt + 1):
        m_size = gt_sizes[g]
        if n_pred == 0:
            u += m_size
            continue
        inter = joint[g, 1:].copy()
        union = m_size + pred_sizes[1:] - inter
        inter = np.where(used[1:], 0.0, inter)
        union = np.where(used[1:], m_size, union)
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
        hit = int(np.argmax(iou))  # first max on ties, like np.argmax in the ref
        c += inter[hit]
        u += union[hit]
        used[hit + 1] = True

    # predictions never matched contribute their full area to the union
    unused_pred_pixels = pred_sizes[1:][~used[1:]].sum()
    u += unused_pred_pixels
    return float(c / u) if u > 0 else 0.0


def pixel_f1(gt_ins: np.ndarray, pred_ins: np.ndarray) -> float:
    """F1 of foreground/background binarization."""
    gt_fg = np.asarray(gt_ins) > 0
    pred_fg = np.asarray(pred_ins) > 0
    tp = float(np.sum(gt_fg & pred_fg))
    fp = float(np.sum(~gt_fg & pred_fg))
    fn = float(np.sum(gt_fg & ~pred_fg))
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom > 0 else 0.0


def get_fast_pq(true: np.ndarray, pred: np.ndarray, match_iou: float = 0.5):
    """Panoptic-quality statistics [dq, sq, pq] plus pairing info.

    IoU pairing semantics mirror the reference: for ``match_iou >= 0.5`` any
    IoU above the threshold is a unique pair; below 0.5 a Hungarian pass
    maximizes total IoU and pairs above the threshold are kept.
    """
    assert match_iou >= 0.0
    true = np.asarray(true)
    pred = np.asarray(pred)

    joint = _contingency(true, pred)
    n_gt_max = joint.shape[0] - 1
    n_pred_max = joint.shape[1] - 1
    if n_gt_max > 0 and n_pred_max > 0:
        inter = joint[1:, 1:]
        t_sizes = joint[1:, :].sum(axis=1, keepdims=True)
        p_sizes = joint[:, 1:].sum(axis=0, keepdims=True)
        union = t_sizes + p_sizes - inter
        pairwise_iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
    else:
        pairwise_iou = np.zeros((max(n_gt_max, 0), max(n_pred_max, 0)))

    if match_iou >= 0.5:
        keep = pairwise_iou > match_iou
        paired_true, paired_pred = np.nonzero(keep)
        paired_iou = pairwise_iou[paired_true, paired_pred]
        paired_true = paired_true + 1
        paired_pred = paired_pred + 1
    else:
        if pairwise_iou.size:
            pt, pp = linear_sum_assignment(-pairwise_iou)
            piou = pairwise_iou[pt, pp]
            sel = piou > match_iou
            paired_true = pt[sel] + 1
            paired_pred = pp[sel] + 1
            paired_iou = piou[sel]
        else:
            paired_true = np.array([], dtype=np.int64)
            paired_pred = np.array([], dtype=np.int64)
            paired_iou = np.array([])

    paired_true_set = set(paired_true.tolist())
    paired_pred_set = set(paired_pred.tolist())
    unpaired_true = [i for i in range(1, n_gt_max + 1) if gtn(joint, i) and i not in paired_true_set]
    unpaired_pred = [j for j in range(1, n_pred_max + 1) if prn(joint, j) and j not in paired_pred_set]

    tp = len(paired_true)
    fp = len(unpaired_pred)
    fn = len(unpaired_true)
    dq = tp / (tp + 0.5 * fp + 0.5 * fn) if (tp + fp + fn) > 0 else 0.0
    sq = paired_iou.sum() / (tp + 1.0e-6)
    return [dq, sq, dq * sq], [list(paired_true), list(paired_pred), unpaired_true, unpaired_pred]


def gtn(joint: np.ndarray, i: int) -> bool:
    """True if GT id ``i`` is actually present in the image."""
    return joint[i, :].sum() > 0


def prn(joint: np.ndarray, j: int) -> bool:
    """True if prediction id ``j`` is actually present in the image."""
    return joint[:, j].sum() > 0
