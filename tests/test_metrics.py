"""Golden tests for evaluation metrics.

Each fast contingency-table implementation is validated against a literal
nested-loop oracle that follows the metric definitions used by the reference
evaluation code (lib/evaluate/CVPPP_evaluate.pyx, metrics_bbbc.py).
"""

import numpy as np
import pytest

from pctrans_tpu.inference import metrics_cvppp as mc
from pctrans_tpu.inference import metrics_bbbc as mb


# ---------------------------------------------------------------- oracles
def dice_pair(a, b, i, j):
    am = a == i
    bm = b == j
    s = am.sum() + bm.sum()
    return 2.0 * np.sum(am & bm) / s if s > 1e-8 else 0.0


def best_dice_naive(in_label, gt_label):
    max_in, min_in = int(in_label.max()), int(in_label.min())
    max_gt, min_gt = int(gt_label.max()), int(gt_label.min())
    if max_in == min_in:
        return 0.0
    score = 0.0
    for i in range(min_in + 1, max_in + 1):
        s_max = 0.0
        for j in range(min_gt + 1, max_gt + 1):
            s_max = max(s_max, dice_pair(in_label, gt_label, i, j))
        score += s_max
    return score / (max_in - min_in)


def aji_naive(gt, pred):
    """Literal transcription of the greedy AJI definition."""
    n_gt = int(gt.max())
    n_pred = int(pred.max())
    used = np.zeros(n_pred + 1, dtype=bool)
    c = u = 0.0
    for g in range(1, n_gt + 1):
        m = gt == g
        inters, unions = [], []
        for p_id in range(1, n_pred + 1):
            if used[p_id]:
                inters.append(0)
                unions.append(np.count_nonzero(m))
            else:
                p = pred == p_id
                i = np.count_nonzero(m & p)
                inters.append(i)
                unions.append(np.count_nonzero(m) + np.count_nonzero(p) - i)
        iou = np.array(inters) / np.array(unions)
        hit = int(np.argmax(iou))
        c += inters[hit]
        u += unions[hit]
        used[hit + 1] = True
    for p_id in range(1, n_pred + 1):
        if not used[p_id]:
            u += np.count_nonzero(pred == p_id)
    return c / u


def random_labels(rng, shape=(40, 40), n=5):
    """Random blobby instance maps with contiguous labels."""
    lab = np.zeros(shape, dtype=np.uint16)
    for k in range(1, n + 1):
        cy, cx = rng.randint(0, shape[0]), rng.randint(0, shape[1])
        r = rng.randint(3, 10)
        yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
        lab[(yy - cy) ** 2 + (xx - cx) ** 2 < r**2] = k
    return mb.remap_label(lab).astype(np.uint16)


# ------------------------------------------------------------------ CVPPP
class TestCVPPP:
    def test_best_dice_matches_naive(self, rng):
        for _ in range(5):
            a = random_labels(rng, n=rng.randint(1, 7))
            b = random_labels(rng, n=rng.randint(1, 7))
            assert mc.BestDice(a, b) == pytest.approx(best_dice_naive(a, b), abs=1e-9)
            assert mc.BestDice(b, a) == pytest.approx(best_dice_naive(b, a), abs=1e-9)

    def test_sbd_is_min_of_directions(self, rng):
        a = random_labels(rng, n=4)
        b = random_labels(rng, n=6)
        assert mc.SymmetricBestDice(a, b) == pytest.approx(
            min(mc.BestDice(a, b), mc.BestDice(b, a))
        )
        lo, hi = mc.SymmetricBestDice_both(a, b)
        assert lo <= hi
        assert mc.SymmetricBestDice_max(a, b) == pytest.approx(hi)

    def test_perfect_prediction(self, rng):
        a = random_labels(rng, n=5)
        assert mc.SymmetricBestDice(a, a) == pytest.approx(1.0)
        assert mc.AbsDiffFGLabels(a, a) == 0.0

    def test_trivial_background_only(self):
        a = np.zeros((16, 16), dtype=np.uint16)
        b = np.ones((16, 16), dtype=np.uint16)
        b[:8] = 0
        assert mc.BestDice(a, b) == 0.0

    def test_absent_labels_count_in_denominator(self):
        # labels 1 and 3 present, 2 absent: denominator is still 3.
        a = np.zeros((9, 9), dtype=np.uint16)
        a[0:3, 0:3] = 1
        a[6:9, 6:9] = 3
        gt = a.copy()
        bd = mc.BestDice(a, gt)
        assert bd == pytest.approx(best_dice_naive(a, gt), abs=1e-12)
        assert bd == pytest.approx(2.0 / 3.0)

    def test_diff_fg_labels(self):
        a = np.zeros((8, 8), dtype=np.uint16)
        a[0, 0] = 3
        b = np.zeros((8, 8), dtype=np.uint16)
        b[0, 0] = 5
        assert mc.DiffFGLabels(a, b) == -2.0
        assert mc.AbsDiffFGLabels(a, b) == 2.0

    def test_fgbg_dice(self, rng):
        a = random_labels(rng, n=3)
        assert mc.FGBGDice(a, a) == pytest.approx(1.0)


# ------------------------------------------------------------------- BBBC
class TestBBBC:
    def test_aji_matches_naive(self, rng):
        for _ in range(5):
            gt = random_labels(rng, n=rng.randint(2, 6))
            pred = random_labels(rng, n=rng.randint(2, 6))
            assert mb.agg_jc_index(gt, pred) == pytest.approx(aji_naive(gt, pred), abs=1e-9)

    def test_aji_perfect(self, rng):
        gt = random_labels(rng, n=4)
        assert mb.agg_jc_index(gt, gt) == pytest.approx(1.0)

    def test_pixel_f1(self, rng):
        gt = random_labels(rng, n=4)
        assert mb.pixel_f1(gt, gt) == pytest.approx(1.0)
        pred = np.zeros_like(gt)
        assert mb.pixel_f1(gt, pred) == 0.0

    def test_pq_perfect(self, rng):
        gt = random_labels(rng, n=5)
        (dq, sq, pq), _ = mb.get_fast_pq(gt, gt)
        assert dq == pytest.approx(1.0)
        assert sq == pytest.approx(1.0, abs=1e-5)
        assert pq == pytest.approx(1.0, abs=1e-5)

    def test_pq_counts(self):
        gt = np.zeros((20, 20), dtype=np.int32)
        gt[0:10, 0:10] = 1
        gt[12:20, 12:20] = 2
        pred = np.zeros_like(gt)
        pred[0:10, 0:10] = 1  # perfect match for gt 1
        pred[0:2, 18:20] = 2  # spurious
        (dq, sq, pq), (pt, pp, ut, up) = mb.get_fast_pq(gt, pred)
        assert pt == [1] and pp == [1]
        assert ut == [2] and up == [2]
        assert dq == pytest.approx(1 / (1 + 0.5 + 0.5))

    def test_remap_label(self):
        x = np.array([[0, 5], [3, 5]])
        y = mb.remap_label(x)
        assert set(np.unique(y)) == {0, 1, 2}
        # order of first appearance preserved (np.unique sorts: 3 -> 1, 5 -> 2)
        assert y[1, 0] == 1 and y[0, 1] == 2

    def test_remap_label_by_size(self):
        x = np.zeros((10, 10), dtype=np.int32)
        x[:2, :2] = 7   # 4 px
        x[5:, 5:] = 2   # 25 px
        y = mb.remap_label(x, by_size=True)
        assert (y[5:, 5:] == 1).all()
        assert (y[:2, :2] == 2).all()
