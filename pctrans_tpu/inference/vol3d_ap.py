"""3D instance-segmentation average precision (legacy EM evaluation).

Equivalent of the reference ``evaluate_ap``
(connectomics/inference/evaluation/evaluate_ap.py:132-436, the default
non-Hungarian path): build the pred/GT overlap table, score each instance by
its best-overlap IoU, and per IoU threshold compute

    AP_TP = #(pred best-IoU > th), AP_FP = #(pred best-IoU <= th),
    AP_FN = #(GT best-IoU <= th),  AP = precision * recall

averaged over thresholds 0.5..0.95 (:396-430).  Also reports the reference's
"general" table: mean best dice/IoU/SEG in both directions and the
non-split / FP / FN / TP counts from the >50%-of-GT coverage matching
(:211-245, 344-375).  Vectorized contingency math instead of the
reference's per-pair Python dict loops.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def evaluate_ap(pred_labels: np.ndarray, gt_labels: np.ndarray,
                background: Optional[int] = 0,
                foreground_only: bool = False,
                thresholds: Sequence[float] = (0.5, 0.55, 0.6, 0.65, 0.7,
                                               0.75, 0.8, 0.85, 0.9, 0.95),
                ) -> Tuple[float, float, float, Dict]:
    """Returns (AP@0.75, AP@0.5, avAP, metrics_dict) — the reference's return
    triple (:434-436) plus the full metrics tree."""
    pred = np.ravel(pred_labels).astype(np.int64)
    gt = np.ravel(gt_labels).astype(np.int64)
    if foreground_only:
        pred = np.where(gt == 0, 0, pred)

    # a nonzero background id is SWAPPED with 0 first (np.unique sorts, so
    # merely prefixing the background value does not pin it to index 0 —
    # the smallest real instance would be excluded instead)
    if background is not None and background != 0:
        for arr in (pred, gt):
            zeros = arr == 0
            arr[arr == background] = 0
            arr[zeros] = background
    # remap to consecutive ids (0 pinned): the contingency table is then
    # bounded by the number of DISTINCT instances, not max id (24-bit VAST
    # ids would otherwise demand a petabyte table; cf. the sparse form the
    # reference used, evaluate_ap.py:181)
    _, pred = np.unique(np.concatenate([[0], pred]), return_inverse=True)
    _, gt = np.unique(np.concatenate([[0], gt]), return_inverse=True)
    pred, gt = pred[1:], gt[1:]
    if background is not None:
        background = 0  # remapped position of the background id
    n_p = int(pred.max()) + 1
    n_g = int(gt.max()) + 1
    # SPARSE overlap pairs (unique label pairs + voxel counts): a dense
    # [n_p, n_g] table is ~7 GB at a routine 30k x 30k connectomics eval
    # while the pairs are O(distinct overlaps)
    pair_keys, pair_cnt = np.unique(pred.astype(np.int64) * n_g + gt,
                                    return_counts=True)
    pr = (pair_keys // n_g).astype(np.int64)
    gc_id = (pair_keys % n_g).astype(np.int64)
    cnt = pair_cnt.astype(np.float64)
    pred_counts = np.bincount(pr, weights=cnt, minlength=n_p)
    gt_counts = np.bincount(gc_id, weights=cnt, minlength=n_g)

    pred_ids = np.where(pred_counts > 0)[0]
    gt_ids = np.where(gt_counts > 0)[0]
    if background is not None:
        pred_ids = pred_ids[pred_ids != background]
        gt_ids = gt_ids[gt_ids != background]
        keep = (pr != background) & (gc_id != background)
        pr, gc_id, cnt = pr[keep], gc_id[keep], cnt[keep]
    if len(pred_ids) == 0 or len(gt_ids) == 0:
        return 0.0, 0.0, 0.0, {}

    pc = pred_counts[pr]
    gc = gt_counts[gc_id]
    iou_v = cnt / (pc + gc - cnt)                 # per-pair IoU (cnt > 0)
    dice_v = 2.0 * cnt / (pc + gc)
    # SEG: IoU gated by >50% coverage of the GT (resp. pred) instance
    gt_gate = cnt > 0.5 * gc
    p_gate = cnt > 0.5 * pc

    def col_max(vals, mask=None):
        out = np.zeros(n_g)
        v = vals if mask is None else np.where(mask, vals, 0.0)
        np.maximum.at(out, gc_id, v)
        return out[gt_ids]

    def row_max(vals, mask=None):
        out = np.zeros(n_p)
        v = vals if mask is None else np.where(mask, vals, 0.0)
        np.maximum.at(out, pr, v)
        return out[pred_ids]

    metrics: Dict = {"general": {}}
    gen = metrics["general"]
    gen["Num GT"] = int(len(gt_ids))
    gen["Num Pred"] = int(len(pred_ids))
    gen["GT/Ref -> Pred mean dice"] = float(col_max(dice_v).mean())
    gen["Pred -> GT/Ref mean dice"] = float(row_max(dice_v).mean())
    iou_gt = col_max(iou_v)                        # per-GT best IoU
    iou_p = row_max(iou_v)                         # per-pred best IoU
    gen["GT/Ref -> Pred mean iou"] = float(iou_gt.mean())
    gen["Pred -> GT/Ref mean iou"] = float(iou_p.mean())
    gen["GT/Ref -> Pred mean seg"] = float(col_max(iou_v, gt_gate).mean())
    gen["Pred -> GT/Ref mean seg"] = float(row_max(iou_v, gt_gate).mean())
    gen["Pred -> GT/Ref mean seg rev"] = float(row_max(iou_v, p_gate).mean())

    # >50%-of-GT coverage matching matrix (:211-245)
    m_per_row = np.bincount(pr[gt_gate], minlength=n_p)[pred_ids]
    m_per_col = np.bincount(gc_id[gt_gate], minlength=n_g)[gt_ids]
    n_matches = int(gt_gate.sum())
    gen["Pred -> GT/Ref NS"] = int(n_matches - (m_per_row > 0).sum())
    gen["Pred -> GT/Ref FP"] = int((m_per_row == 0).sum())
    gen["Pred -> GT/Ref TP"] = int((m_per_row == 1).sum())
    gen["GT/Ref -> Pred FN"] = int((m_per_col == 0).sum())
    gen["GT/Ref -> Pred TP"] = int((m_per_col > 0).sum())

    metrics["confusion_matrix"] = {}
    aps = []
    for th in thresholds:
        ap_tp = int((iou_p > th).sum())
        ap_fp = int((iou_p <= th).sum())
        ap_fn = int((iou_gt <= th).sum())
        p = ap_tp / max(1, ap_tp + ap_fp)
        rec = ap_tp / max(1, ap_tp + ap_fn)
        ap = p * rec
        aps.append(ap)
        precision = ap_tp / max(1, len(pred_ids))
        recall = ap_tp / max(1, len(gt_ids))
        fscore = (2 * precision * recall / (precision + recall)
                  if precision + recall > 0 else 0.0)
        metrics["confusion_matrix"][f"th_{str(th).replace('.', '_')}"] = {
            "AP_TP": ap_tp, "AP_FP": ap_fp, "AP_FN": ap_fn, "AP": ap,
            "precision": precision, "recall": recall, "fscore": fscore,
        }
    av_ap = float(np.mean(aps))
    metrics["confusion_matrix"]["avAP"] = av_ap

    ap75 = metrics["confusion_matrix"].get("th_0_75", {}).get("AP", 0.0)
    ap50 = metrics["confusion_matrix"].get("th_0_5", {}).get("AP", 0.0)
    return ap75, ap50, av_ap, metrics
