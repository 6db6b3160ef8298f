"""Curvilinear-structure evaluation: correctness / completeness / quality.

Equivalent of the reference's ``scripts/tools/eval_curvilinear.py`` (CCQ
metrics of Mosinska et al., arXiv:1712.02190, plus foreground IoU).  The
reference leans on ``skimage.morphology.skeletonize`` / ``dilation``;
skimage is not in this image, so both are implemented here in vectorized
numpy: the skeletonization is the Zhang–Suen two-subiteration thinning —
the same algorithm skimage's 2D ``skeletonize`` (method="zhang") uses — and
the dilation is a separable sliding maximum.

All functions are pure host-side numpy: CCQ is an offline evaluation of
written prediction PNGs (reference ``evaluate``, eval_curvilinear.py:79-95),
never part of the jitted train/eval path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def binary_dilation_square(mask: np.ndarray, size: int = 5) -> np.ndarray:
    """Morphological dilation by a size x size square (skimage
    ``dilation(x, square(size))`` for binary inputs): separable sliding OR."""
    if size <= 1:
        return mask.astype(bool)
    r = size // 2
    out = mask.astype(bool)
    # horizontal then vertical pass (square SE is separable)
    for axis in (1, 0):
        acc = out.copy()
        for s in range(1, r + 1):
            shifted = np.zeros_like(out)
            src = [slice(None)] * 2
            dst = [slice(None)] * 2
            src[axis] = slice(s, None)
            dst[axis] = slice(None, -s)
            shifted[tuple(dst)] = out[tuple(src)]
            acc |= shifted
            shifted = np.zeros_like(out)
            src[axis] = slice(None, -s)
            dst[axis] = slice(s, None)
            shifted[tuple(dst)] = out[tuple(src)]
            acc |= shifted
        out = acc
    return out


def _neighbors(img: np.ndarray):
    """The 8 neighbors p2..p9 of every pixel (zero-padded borders), in the
    Zhang–Suen clockwise order starting north."""
    p = np.pad(img, 1)
    return (
        p[:-2, 1:-1],   # p2 N
        p[:-2, 2:],     # p3 NE
        p[1:-1, 2:],    # p4 E
        p[2:, 2:],      # p5 SE
        p[2:, 1:-1],    # p6 S
        p[2:, :-2],     # p7 SW
        p[1:-1, :-2],   # p8 W
        p[:-2, :-2],    # p9 NW
    )


def skeletonize_zhang(mask: np.ndarray, max_iters: int = 10000) -> np.ndarray:
    """Zhang–Suen thinning of a binary image (T. Y. Zhang & C. Y. Suen,
    CACM 1984) — the algorithm behind skimage's 2D ``skeletonize``.

    Each iteration runs the two subiterations; pixels are deleted when
    2 <= B(p) <= 6, A(p) == 1 and the subiteration's two 3-factor products
    vanish.  Stops when an iteration deletes nothing.
    """
    img = (np.asarray(mask) != 0).astype(np.uint8)
    for _ in range(max_iters):
        changed = False
        for step in (0, 1):
            p2, p3, p4, p5, p6, p7, p8, p9 = _neighbors(img)
            ring = (p2, p3, p4, p5, p6, p7, p8, p9, p2)
            # A(p): 0->1 transitions around the ring
            a = np.zeros_like(img, np.uint8)
            for i in range(8):
                a += (ring[i] == 0) & (ring[i + 1] == 1)
            b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
            cond = (img == 1) & (b >= 2) & (b <= 6) & (a == 1)
            if step == 0:
                cond &= (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
            else:
                cond &= (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
            if cond.any():
                img[cond] = 0
                changed = True
        if not changed:
            break
    return img.astype(bool)


def foreground_iou(pred: np.ndarray, gt: np.ndarray) -> float:
    """Binary foreground IoU (reference ``calc_iou``)."""
    pred = np.asarray(pred, bool)
    gt = np.asarray(gt, bool)
    union = float(np.logical_or(pred, gt).sum())
    if union == 0:
        return 0.0
    return float(np.logical_and(pred, gt).sum()) / union


def ccq(pred: np.ndarray, gt: np.ndarray,
        dilation_size: int = 5) -> Tuple[float, float, float]:
    """Correctness / completeness / quality of a binary prediction against a
    binary ground truth (reference ``compute_precision_recall`` +
    ``compute_metrics``): both maps are skeletonized; a predicted skeleton
    pixel is correct if it falls inside the dilated GT skeleton, a GT
    skeleton pixel is complete if covered by the dilated prediction
    skeleton; quality combines both.
    """
    pred_skel = skeletonize_zhang(pred)
    gt_skel = skeletonize_zhang(gt)
    pred_dil = binary_dilation_square(pred_skel, dilation_size)
    gt_dil = binary_dilation_square(gt_skel, dilation_size)

    tpcor = float((pred_skel & gt_dil).sum())
    tpcom = float((gt_skel & pred_dil).sum())
    fp = float(pred_skel.sum()) - tpcor
    fn = float(gt_skel.sum()) - tpcom

    correctness = tpcor / (tpcor + fp) if (tpcor + fp) else 0.0
    completeness = tpcom / (tpcom + fn) if (tpcom + fn) else 0.0
    denom = completeness - completeness * correctness + correctness
    quality = (completeness * correctness / denom) if denom else 0.0
    return correctness, completeness, quality


def evaluate_pair(pred: np.ndarray, gt: np.ndarray, thres: int = 128,
                  dilation_size: int = 5) -> Tuple[float, float, float, float]:
    """One image through the reference protocol (``binarize`` +
    ``evaluate``): prediction binarized at ``thres``; GT foreground is
    nonzero-and-not-255 (255 = ignore in the reference's label PNGs).
    Returns (foreground_iou, correctness, completeness, quality); all 1.0
    when the GT is empty, matching the reference.
    """
    pred_b = np.asarray(pred) > thres
    gt_arr = np.asarray(gt)
    gt_b = (gt_arr != 0) & (gt_arr != 255)
    if gt_b.sum() == 0:
        return 1.0, 1.0, 1.0, 1.0
    iou = foreground_iou(pred_b, gt_b)
    cor, com, qua = ccq(pred_b, gt_b, dilation_size)
    return iou, cor, com, qua
