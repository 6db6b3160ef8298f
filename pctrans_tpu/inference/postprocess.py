"""Instance postprocessing: dice clustering, mask NMS, argmax painting.

Semantics follow the reference ``MaskFormer.instance_inference`` and its
helpers (arch/maskformer.py:267-431):

CVPPP: sigmoid > 0.69 -> drop area <= 40 -> greedy dice clustering
(``mask_post`` thres1=0.5, merge = mean of members, re-binarize at 0.6) ->
mask NMS with MMI >= 0.72 and area-ratio scores -> paint by ascending area
with argmax (first-max wins on overlap).

BBBC: sigmoid > 0.05 -> drop area <= 40 -> ``mask_post(0.15, 0.25)`` without
re-binarization (merged masks stay fractional) -> paint by ascending area.

The greedy loops operate on Q x Q matrices (tiny) and are exposed as
stats-level helpers (``clusters_from_dice``, ``nms_keep``) shared with the
production device path (:mod:`pctrans_tpu.inference.device_postprocess`),
which runs every pixel-scale step — thresholding, intersections, merging,
painting — on the TPU and ships only [K] / [K, K] statistics and the final
label map to the host.  This module is the self-contained numpy oracle.

The reference leaves an ``io.imsave`` + ``pdb.set_trace()`` inside the CVPPP
path (maskformer.py:305-306) — an as-published landmine, not reproduced.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def pairwise_dice_binary(masks: np.ndarray) -> np.ndarray:
    """dice[i,j] = (2*|i&j| + 1) / (|i| + |j| + 1) for binary/float masks
    [N, H, W] (maskformer.py:392-401 — no sigmoid; inputs already 0/1)."""
    flat = masks.reshape(masks.shape[0], -1).astype(np.float32)
    inter = flat @ flat.T
    sums = flat.sum(axis=1)
    return (2.0 * inter + 1.0) / (sums[:, None] + sums[None, :] + 1.0)


def clusters_from_dice(dice: np.ndarray, thres1: float) -> List[List[int]]:
    """Greedy dice-similarity clustering (maskformer.py:403-418).

    Iterates mask indices in order; an index already absorbed into any
    earlier cluster cannot seed a new one, but can appear again as a member
    (faithful to the reference's flat ``clutering_list``).  Operates purely
    on the K x K dice matrix so the device path can reuse it on
    device-computed statistics without the masks ever reaching the host.
    """
    n = dice.shape[0]
    clustered: set = set()
    clusters: List[List[int]] = []
    for i in range(n):
        if i in clustered:
            continue
        members = np.where(dice[i] > thres1)[0].tolist()
        clustered.update(members)
        clusters.append(members)
    return clusters


def dice_from_stats(areas: np.ndarray, inter: np.ndarray) -> np.ndarray:
    """Pairwise dice from per-mask areas [K] and intersections [K, K] —
    identical values to :func:`pairwise_dice_binary` (integer-exact inputs,
    same f32 arithmetic), without needing the masks themselves."""
    a = areas.astype(np.float32)
    return (2.0 * inter.astype(np.float32) + 1.0) / (a[:, None] + a[None, :] + 1.0)


def mask_post(
    inst_masks: np.ndarray,
    thres1: float,
    thres2: float,
    bd_flag: bool = False,
    dice: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Greedy dice clustering + mean merge (maskformer.py:403-431)."""
    if dice is None:
        dice = pairwise_dice_binary(inst_masks)
    clusters = clusters_from_dice(dice, thres1)

    merged = []
    for members in clusters:
        m = inst_masks[members].mean(axis=0)
        if bd_flag:
            m = (m > thres2).astype(inst_masks.dtype)
        merged.append(m)
    return np.stack(merged)


def comput_mmi(area_a: float, area_b: float, intersect: float) -> float:
    eps = 1e-5
    if area_a == 0 or area_b == 0:
        area_a += eps
        area_b += eps
    return max(intersect / area_a, intersect / area_b)


def nms_keep(
    areas: np.ndarray, inter: np.ndarray, scores: np.ndarray, thres: float
) -> List[int]:
    """Greedy MMI-based suppression on mask statistics (maskformer.py:357-390);
    returns the kept indices in keep order.  Shared by the numpy and device
    paths — the greedy semantics live in exactly one place."""
    order = np.argsort(scores)[::-1].tolist()
    n = areas.shape[0]
    suppressed = np.zeros(n, dtype=bool)
    keep: List[int] = []
    for i in range(n):
        idx = order[i]
        if suppressed[idx]:
            continue
        keep.append(idx)
        for j in range(i + 1, n):
            jdx = order[j]
            if suppressed[jdx]:
                continue
            mmi = comput_mmi(areas[idx], areas[jdx], inter[idx, jdx])
            if mmi >= thres:
                suppressed[jdx] = True
    return keep


def mask_nms(masks: np.ndarray, scores: np.ndarray, thres: float = 0.3) -> np.ndarray:
    """Greedy MMI-based suppression (maskformer.py:357-390)."""
    n = masks.shape[0]
    flat = masks.reshape(n, -1).astype(np.float32)
    areas = flat.sum(axis=1)
    inter = flat @ flat.T
    return masks[nms_keep(areas, inter, scores, thres)]


def paint_ascending_area(masks: np.ndarray, out_dtype=np.int16) -> np.ndarray:
    """Sort by ascending area, prepend zero background, argmax-paint
    (maskformer.py:298-304).  First max wins ties, so with binary masks the
    smallest overlapping instance takes the pixel."""
    areas = masks.reshape(masks.shape[0], -1).sum(axis=1)
    order = np.argsort(areas, kind="stable")
    sorted_masks = masks[order]
    stack = np.concatenate([np.zeros((1,) + masks.shape[1:], masks.dtype), sorted_masks])
    return np.argmax(stack, axis=0).astype(out_dtype)


def instance_inference_cvppp(
    probs: np.ndarray,
    threshold: float = 0.69,
    min_area: float = 40.0,
    cluster_thres1: float = 0.5,
    cluster_thres2: float = 0.6,
    nms_thres: float = 0.72,
) -> np.ndarray:
    """probs: sigmoid mask probabilities [Q, H, W] -> int16 label map [H, W]."""
    pred = (probs > threshold).astype(np.float32)
    areas = pred.reshape(pred.shape[0], -1).sum(axis=1)
    pred = pred[areas > min_area]
    if pred.shape[0] == 0:
        return np.zeros(probs.shape[1:], np.int16)
    pred = mask_post(pred, cluster_thres1, cluster_thres2, bd_flag=True)
    areas = pred.reshape(pred.shape[0], -1).sum(axis=1)
    scores = areas / max(areas.max(), 1e-5)
    pred = mask_nms(pred, scores, thres=nms_thres)
    return paint_ascending_area(pred)


def instance_inference_bbbc(
    probs: np.ndarray,
    threshold: float = 0.05,
    min_area: float = 40.0,
    cluster_thres1: float = 0.15,
    cluster_thres2: float = 0.25,
) -> np.ndarray:
    """probs: sigmoid mask probabilities [Q, H, W] -> int16 label map [H, W]."""
    pred = (probs > threshold).astype(np.float32)
    areas = pred.reshape(pred.shape[0], -1).sum(axis=1)
    pred = pred[areas > min_area]
    if pred.shape[0] == 0:
        return np.zeros(probs.shape[1:], np.int16)
    pred = mask_post(pred, cluster_thres1, cluster_thres2, bd_flag=False)
    return paint_ascending_area(pred)


def merge_small_object(seg: np.ndarray, threshold: int = 5, window: int = 5) -> np.ndarray:
    """Absorb tiny instances into their dominant neighbor
    (engine/trainer.py:752-777, used by test_cvppp's merge_func)."""
    seg = seg.copy()
    uid, uc = np.unique(seg, return_counts=True)
    for ids, size in zip(uid, uc):
        if size > threshold:
            continue
        pos_x, pos_y = np.where(seg == ids)
        cx = int(pos_x.sum() // pos_x.size) - window // 2
        cy = int(pos_y.sum() // pos_y.size) - window // 2
        # Raw python slicing exactly as the reference (trainer.py:761-766):
        # a negative start wraps to the array end, so the crop around an
        # instance within window//2 of the top/left border is (normally)
        # empty and that instance is NOT merged.  Kept bit-identical — this
        # function defines the CodaLab submission output.
        crop = seg[cx : cx + window, cy : cy + window]
        t_uid, t_uc = np.unique(crop, return_counts=True)
        rank = np.argsort(-t_uc)
        if len(t_uc) > 2:
            if t_uid[rank[0]] == 0:
                max_ids = t_uid[rank[2]] if t_uid[rank[1]] == ids else t_uid[rank[1]]
            else:
                max_ids = t_uid[rank[0]]
            seg[seg == ids] = max_ids
    return seg


def merge_func(seg: np.ndarray) -> np.ndarray:
    """CVPPP test-set cleanup chain (engine/trainer.py:744-750)."""
    seg = merge_small_object(seg)
    seg = merge_small_object(seg, threshold=20, window=11)
    seg = merge_small_object(seg, threshold=50, window=11)
    return seg
