"""Score-ranked COCO-style 3D instance AP (``VOL3Deval``).

Rebuild of the reference's confidence-ranked mAP pipeline:
``seg_iou3d_sorted`` (connectomics/inference/evaluation/vol3d_util.py:163-253)
computes, per score-sorted prediction, its best-IoU ground-truth match within
each object-size band; ``VOL3Deval`` (vol3d_eval.py:7-323, itself derived
from the COCO toolbox) turns those matches into PR curves over the IoU
thresholds .5:.05:.95 and 101 recall points, and summarizes mAP / AP50 /
AP75 / per-size AP75.

Differences from the reference (outputs identical):
- the per-prediction bbox-crop ``unique_chunks_bbox`` loop is replaced by
  one dense contingency table over remapped ids (vectorized; the chunked
  h5-friendly streaming path is unnecessary for in-memory arrays);
- ``get_dtm_by_area``'s in-place mutation of the match table through a
  numpy view (vol3d_eval.py:113-115) is not reproduced — the fallback to
  the 'all'-band match is computed without side effects;
- file outputs (txt/csv) are optional and off by default.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def default_area_ranges(thresholds: Sequence[float] = (5e3, 3e4)) -> np.ndarray:
    """[all, <t0, t0..t1, .., >tn] size bands (evaluate_mito.py:108-114)."""
    thres = np.asarray(thresholds, float)
    rng = np.zeros((len(thres) + 2, 2))
    rng[0, 1] = 1e10
    rng[-1, 1] = 1e10
    rng[2:, 0] = thres
    rng[1:-1, 1] = thres
    return rng


def seg_iou3d_sorted(
    pred: np.ndarray,
    gt: np.ndarray,
    score: Optional[np.ndarray] = None,
    areaRng: Optional[np.ndarray] = None,
    crumb_size: int = -1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Best-IoU matches per score-sorted prediction.

    pred/gt: integer instance volumes (any shape, 0 = background).
    score: [N, 2] (pred_id, confidence); defaults to size-as-confidence
    (evaluate_mito.py:100-106).  crumb_size drops GT smaller than it.

    Returns (result_p [D, 2+3A], result_fn [F, 5], scores_sorted [D, 1]):
    result_p rows are (pred_id, pred_size, then per size band:
    gt_id, gt_size, iou of the best in-band match); result_fn rows are
    (best_pred_id, best_pred_size, gt_id, gt_size, best_iou) for GT that no
    prediction claimed as its 'all'-band best match.
    """
    if areaRng is None:
        areaRng = default_area_ranges()
    areaRng = np.asarray(areaRng, float)

    pred = np.ravel(np.asarray(pred)).astype(np.int64)
    gt = np.ravel(np.asarray(gt)).astype(np.int64)

    pred_id, pred_sz = np.unique(pred, return_counts=True)
    pred_sz = pred_sz[pred_id > 0]
    pred_id = pred_id[pred_id > 0]
    gt_id, gt_sz = np.unique(gt, return_counts=True)
    gt_sz = gt_sz[gt_id > 0]
    gt_id = gt_id[gt_id > 0]
    if crumb_size > -1:
        keep = gt_sz >= crumb_size
        gt_id, gt_sz = gt_id[keep], gt_sz[keep]

    if score is None:
        score = np.stack([pred_id, pred_sz], axis=1).astype(float)
    score = np.asarray(score, float)
    if score.size and score[:, 0].max() > (pred_id.max() if len(pred_id) else 0):
        raise ValueError("The predict-score has bigger id than the prediction")
    # id -> confidence relabel array, then unique positive ids sorted by
    # confidence (reference seg_iou3d_sorted, vol3d_util.py:240-249).  Note:
    # the reference then returns ``relabel[pred_id_sorted]`` — indexing the
    # id->score array with *sort-permutation indices* — which misaligns
    # scores whenever ids are not exactly 0..N; here each row's score is
    # looked up by its id, so result_p and scores_sorted always align.
    relabel = np.zeros(int(score[:, 0].max()) + 1 if score.size else 1, float)
    relabel[score[:, 0].astype(np.int64)] = score[:, 1]
    sc_id = np.unique(score[:, 0].astype(np.int64))
    sc_id = sc_id[sc_id > 0]
    todo_id = sc_id[np.argsort(-relabel[sc_id], kind="stable")]
    scores_sorted = relabel[todo_id].reshape(-1, 1)

    # Sparse contingency: unique (pred, gt) overlap pairs with counts —
    # memory is O(distinct overlapping pairs), never the dense [P, G]
    # table (~7 GB float at a routine 30k x 30k connectomics eval; same
    # rationale as metrics_em._contingency_pairs / the reference's
    # bbox-crop streaming, vol3d_util.py:178-210).
    pi = np.zeros(int(pred.max()) + 1 if pred.size else 1, np.int64)
    pi[pred_id] = np.arange(1, len(pred_id) + 1)
    gi = np.zeros(int(gt.max()) + 1 if gt.size else 1, np.int64)
    gi[gt_id] = np.arange(1, len(gt_id) + 1)
    ng = len(gt_id) + 1
    pr, gr = pi[pred], gi[gt]
    fgpair = (pr > 0) & (gr > 0)
    keys, cnt = np.unique(pr[fgpair] * ng + gr[fgpair], return_counts=True)
    pp = (keys // ng - 1).astype(np.int64)   # 0-based pred index per pair
    gg = (keys % ng - 1).astype(np.int64)    # 0-based gt index per pair
    iou_pair = (cnt.astype(float)
                / (pred_sz[pp] + gt_sz[gg] - cnt)) if len(keys) else \
        np.zeros(0)

    # id -> size, 0 for scored ids absent from pred (the reference's
    # ``predict_sz_rl`` zeros array, vol3d_util.py:174-176)
    sz_rl = np.zeros(max(int(pred_id.max()) if len(pred_id) else 0,
                         int(todo_id.max()) if len(todo_id) else 0) + 1,
                     np.int64)
    sz_rl[pred_id] = pred_sz
    sz_p = dict(zip(pred_id.tolist(), pred_sz.tolist()))

    A = areaRng.shape[0]
    result_p = np.zeros((len(todo_id), 2 + 3 * A))
    result_p[:, 0] = todo_id
    result_p[:, 1] = sz_rl[todo_id]

    # position of each pred index in the score-sorted todo order (-1 = the
    # pred exists but was not scored -> it claims nothing, as in the
    # reference where only rows of scored ids are evaluated)
    pos_of_pred = np.full(len(pred_id), -1, np.int64)
    in_pred = pi[todo_id] > 0            # scored ids present in pred
    pos_of_pred[pi[todo_id[in_pred]] - 1] = np.flatnonzero(in_pred)
    tpos = pos_of_pred[pp] if len(pp) else np.zeros(0, np.int64)
    scored_pair = tpos >= 0

    # per-pred best in-band GT: sort pairs by (pred, iou asc, gt desc) and
    # take the last pair per pred — max IoU, ties to the smallest gt index
    # (reference argmax over np.where(gid, row, 0.0) returns the first max)
    band_pair = [(gt_sz[gg] > lo) & (gt_sz[gg] <= hi) for lo, hi in areaRng] \
        if len(gg) else [np.zeros(0, bool)] * A
    for r in range(A):
        sel = band_pair[r] & scored_pair
        if not sel.any():
            continue
        order = np.lexsort((-gg[sel], iou_pair[sel], pp[sel]))
        ps = pp[sel][order]
        gs = gg[sel][order]
        ious = iou_pair[sel][order]
        last = np.flatnonzero(np.r_[ps[1:] != ps[:-1], True])
        j = pos_of_pred[ps[last]]
        result_p[j, 2 + 3 * r] = gt_id[gs[last]]
        result_p[j, 3 + 3 * r] = gt_sz[gs[last]]
        result_p[j, 4 + 3 * r] = ious[last]

    # per-GT best prediction (ties to the higher-scored = earlier pred,
    # matching the reference's strict-greater sequential update :222-224):
    # sort by (gt, iou asc, todo-pos desc); last per gt = max IoU, ties to
    # the smallest todo position.
    gt_best_iou = np.zeros(len(gt_id))
    gt_best_pid = np.zeros(len(gt_id), np.int64)
    if scored_pair.any():
        sel = scored_pair
        order = np.lexsort((-tpos[sel], iou_pair[sel], gg[sel]))
        gs = gg[sel][order]
        ious = iou_pair[sel][order]
        ts = tpos[sel][order]
        last = np.flatnonzero(np.r_[gs[1:] != gs[:-1], True])
        gt_best_iou[gs[last]] = ious[last]
        gt_best_pid[gs[last]] = np.where(ious[last] > 0,
                                         todo_id[ts[last]], 0)

    claimed = result_p[:, 2]
    fn_mask = ~np.isin(gt_id, claimed)
    fn_gid = gt_id[fn_mask]
    fn_gic = gt_sz[fn_mask]
    fn_iou = gt_best_iou[fn_mask]
    fn_pid = gt_best_pid[fn_mask]
    fn_pic = np.array([sz_p.get(int(p), 0) for p in fn_pid])
    result_fn = np.stack([fn_pid, fn_pic, fn_gid, fn_gic, fn_iou], axis=1) \
        if len(fn_gid) else np.zeros((0, 5))
    return result_p, result_fn, scores_sorted


class Params:
    """COCO eval params (vol3d_eval.py:306-323)."""

    def __init__(self, iouType: str = "segm"):
        if iouType not in ("segm", "bbox"):
            raise Exception("iouType not supported")
        self.iouType = iouType
        self.iouThrs = np.linspace(0.5, 0.95, 10, endpoint=True)
        self.recThrs = np.linspace(0.0, 1.00, 101, endpoint=True)
        self.areaRng = np.array([[0, 1e10], [0, 128 ** 2],
                                 [128 ** 2, 256 ** 2], [256 ** 2, 1e10]])
        self.areaRngLbl = ["all", "small", "medium", "large"]


class VOL3Deval:
    """Accumulate/summarize confidence-ranked PR curves (vol3d_eval.py:7-288).

    stats = [mAP, AP50, AP75, AP75-small, AP75-medium, AP75-large, 0...].
    """

    def __init__(self, result_p: np.ndarray, result_fn: np.ndarray,
                 score_p: Optional[np.ndarray] = None,
                 output_name: str = ""):
        self.result_p = np.asarray(result_p, float)
        self.result_fn = np.asarray(result_fn, float).reshape(-1, 5)
        self.output_name = output_name
        self.cocoDt = self.result_p[:, :2]
        self.D = self.cocoDt.shape[0]
        self.scores = (np.zeros(self.D) if score_p is None
                       else np.asarray(score_p, float).ravel())
        self.params = Params()
        self.T = len(self.params.iouThrs)
        n_bands = max(1, (self.result_p.shape[1] - 2) // 3) \
            if self.result_p.ndim == 2 else 1
        self.cocoGt = self.result_p[:, 2:].reshape(-1, n_bands, 3)
        gid, gix = np.unique(
            np.hstack([self.result_fn[:, 2], self.cocoGt[:, 0, 0]]),
            return_index=True)
        gic = np.hstack([self.result_fn[:, 3], self.cocoGt[:, 0, 1]])[gix[gid > 0]]
        self.gid = gid[gid > 0].astype(int)
        self.gic = gic
        self.G = len(self.gid)
        self.eval: dict = {}
        self.stats: np.ndarray = np.zeros(0)

    def get_dtm_by_area(self, area_id: int):
        rng = np.asarray(self.params.areaRng, float)
        gtIg = (self.gic <= rng[area_id, 0]) | (self.gic > rng[area_id, 1])
        gtIg_id = self.gid[gtIg]

        area = self.cocoGt[:, area_id]
        match_id = area[:, 0].astype(int)
        match_iou = area[:, 2].copy()
        # unmatched in this band: fall back to the 'all'-band match
        fb = match_id == 0
        match_iou[fb] = self.cocoGt[fb, 0, 2]
        match_id[fb] = self.cocoGt[fb, 0, 0].astype(int)

        th = self.params.iouThrs[:, None]                       # [T, 1]
        dtm = match_id[None, :] * (match_iou[None, :] >= th)    # [T, D]
        dtIg = (dtm > 0) & np.isin(dtm, gtIg_id)
        a = (self.cocoDt[:, 1] <= rng[area_id, 0]) | \
            (self.cocoDt[:, 1] > rng[area_id, 1])
        dtIg |= (dtm == 0) & a[None, :]
        tps = (dtm > 0) & ~dtIg
        fps = (dtm == 0) & ~dtIg
        npig = int((~gtIg).sum())
        return tps, fps, npig

    def accumulate(self, p: Optional[Params] = None) -> None:
        p = p or self.params
        T, R = len(p.iouThrs), len(p.recThrs)
        A = len(np.asarray(p.areaRng))
        precision = -np.ones((T, R, A))
        recall = -np.ones((T, A))
        scores = -np.ones((T, R, A))
        for a in range(A):
            tps, fps, npig = self.get_dtm_by_area(a)
            if npig == 0:
                continue
            tp_sum = np.cumsum(tps, axis=1).astype(float)
            fp_sum = np.cumsum(fps, axis=1).astype(float)
            for t in range(T):
                tp, fp = tp_sum[t], fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                recall[t, a] = rc[-1] if nd else 0
                # precision envelope, monotone non-increasing from the right
                env = np.maximum.accumulate(pr[::-1])[::-1] if nd else pr
                q = np.zeros(R)
                ss = np.zeros(R)
                inds = np.searchsorted(rc, p.recThrs, side="left")
                ok = inds < nd                       # reference: try/except
                q[ok] = env[inds[ok]]
                ss[ok] = self.scores[inds[ok]]
                precision[t, :, a] = q
                scores[t, :, a] = ss
        self.eval = {"params": p, "counts": [T, R, A],
                     "precision": precision, "recall": recall,
                     "scores": scores}

    def _summarize(self, ap: int = 1, iouThr: Optional[float] = None,
                   areaRng: str = "all") -> float:
        p = self.params
        aind = [i for i, l in enumerate(p.areaRngLbl) if l == areaRng]
        if ap:
            s = self.eval["precision"]
            if iouThr is not None:
                s = s[np.where(p.iouThrs == iouThr)[0]]
            s = s[:, :, aind]
        else:
            s = self.eval["recall"]
            if iouThr is not None:
                s = s[np.where(p.iouThrs == iouThr)[0]]
            s = s[:, aind]
        return float(np.mean(s[s > -1])) if (s > -1).any() else -1.0

    def summarize(self) -> np.ndarray:
        if not self.eval:
            raise Exception("Please run accumulate() first")
        stats = np.zeros(10)
        stats[0] = self._summarize(1)
        stats[1] = self._summarize(1, iouThr=0.5)
        stats[2] = self._summarize(1, iouThr=0.75)
        stats[3] = self._summarize(1, areaRng="small", iouThr=0.75)
        stats[4] = self._summarize(1, areaRng="medium", iouThr=0.75)
        stats[5] = self._summarize(1, areaRng="large", iouThr=0.75)
        self.stats = stats
        return stats

    def save_match_p(self, output_name: str = "") -> None:
        header = ("\tprediction  |\t\t gt all \t\t|\t\t gt small \t\t|\t\t"
                  "gt medium \t\t|\t gt large\n"
                  "ID\tSIZE\t| ID\tSIZE\tIoU\t\t| ID\tSIZE\tIoU\t\t| "
                  "ID\tSIZE\tIoU\t\t| ID\tSIZE\tIoU\n" + "-" * 108)
        fmt = "%d\t\t%4d\t\t" + "\t".join(["%d\t%4d\t%.4f"] * (
            (self.result_p.shape[1] - 2) // 3))
        np.savetxt(self.output_name + output_name + "_match_p.txt",
                   self.result_p, fmt=fmt, header=header)

    def save_match_fn(self, output_name: str = "") -> None:
        header = ("\tprediction \t|\t\tgt \t\n"
                  "ID\tSIZE\t| ID\tSIZE\tIoU \n" + "-" * 40)
        np.savetxt(self.output_name + output_name + "_match_fn.txt",
                   self.result_fn, fmt="%d\t\t%4d\t\t%d\t%4d\t%.4f",
                   header=header)


def evaluate_map(pred: np.ndarray, gt: np.ndarray,
                 score: Optional[np.ndarray] = None,
                 thresholds: Sequence[float] = (5e3, 3e4),
                 crumb_size: int = -1) -> np.ndarray:
    """One-call mAP for in-memory volumes (the eval_mito.py:119-196 flow)."""
    areaRng = default_area_ranges(thresholds)
    result_p, result_fn, score_sorted = seg_iou3d_sorted(
        pred, gt, score, areaRng, crumb_size)
    ev = VOL3Deval(result_p, result_fn, score_sorted)
    ev.params.areaRng = areaRng
    ev.params.areaRngLbl = (["all", "small", "medium", "large"]
                            + ["xl%d" % i for i in range(len(areaRng) - 4)])[
                                : len(areaRng)]
    ev.accumulate()
    return ev.summarize()
