"""Score-ranked 3D mAP (VOL3Deval) tests.

Property checks on constructed volumes plus an oracle comparison: the
oracle transcribes the reference's per-prediction matching loop
(vol3d_util.py:163-237) and COCO accumulate (vol3d_eval.py:100-200)
semantics directly in numpy.
"""

import numpy as np
import pytest

from pctrans_tpu.inference.vol3d_eval import (
    VOL3Deval, default_area_ranges, evaluate_map, seg_iou3d_sorted)


def _two_blob_volume(shift=0):
    gt = np.zeros((4, 32, 32), np.int32)
    gt[:, 4:12, 4:12] = 1
    gt[:, 18:30, 18:30] = 2
    pred = np.zeros_like(gt)
    pred[:, 4 + shift:12 + shift, 4:12] = 5
    pred[:, 18:30, 18:30] = 9
    return pred, gt


class TestSegIoU3dSorted:
    def test_perfect_match_table(self):
        pred, gt = _two_blob_volume()
        rng = default_area_ranges((100,))
        rp, rfn, sc = seg_iou3d_sorted(pred, gt, areaRng=rng)
        assert rp.shape == (2, 2 + 3 * 3)
        # size-as-score ordering: bigger pred (id 9) first
        assert rp[0, 0] == 9 and rp[1, 0] == 5
        assert rp[0, 2] == 2 and rp[0, 4] == pytest.approx(1.0)  # exact IoU
        assert rp[1, 2] == 1 and rp[1, 4] == pytest.approx(1.0)
        assert len(rfn) == 0 and sc.shape == (2, 1)

    def test_partial_overlap_iou(self):
        pred, gt = _two_blob_volume(shift=4)  # pred 5 covers half of gt 1
        rp, rfn, _ = seg_iou3d_sorted(pred, gt)
        row5 = rp[rp[:, 0] == 5][0]
        inter, a = 4 * 4 * 8, 4 * 8 * 8
        assert row5[4] == pytest.approx(inter / (2 * a - inter))

    def test_unclaimed_gt_goes_to_fn(self):
        pred, gt = _two_blob_volume()
        pred[pred == 5] = 0  # gt 1 unmatched entirely
        rp, rfn, _ = seg_iou3d_sorted(pred, gt)
        assert len(rfn) == 1
        assert rfn[0, 2] == 1 and rfn[0, 4] == 0.0  # gt id, best iou
        assert rfn[0, 0] == 0                        # no best pred

    def test_crumb_filter_drops_small_gt(self):
        pred, gt = _two_blob_volume()
        gt[0, 0, 0] = 3  # 1-voxel crumb
        rp, rfn, _ = seg_iou3d_sorted(pred, gt, crumb_size=10)
        all_gids = set(rp[:, 2]) | set(rfn[:, 2] if len(rfn) else [])
        assert 3 not in all_gids

    def test_score_ordering_controls_rows(self):
        pred, gt = _two_blob_volume()
        score = np.array([[5, 0.9], [9, 0.1]])
        rp, _, sc = seg_iou3d_sorted(pred, gt, score=score)
        assert rp[0, 0] == 5 and sc[0, 0] == pytest.approx(0.9)

    def test_background_score_row_keeps_alignment(self):
        # a background (id 0) row in the score table must be dropped without
        # shifting the scores of the rows ranked after it
        pred, gt = _two_blob_volume()
        score = np.array([[5, 0.9], [0, 0.5], [9, 0.1]])
        rp, _, sc = seg_iou3d_sorted(pred, gt, score=score)
        assert rp.shape[0] == 2 and sc.shape == (2, 1)
        assert rp[:, 0].tolist() == [5, 9]
        assert sc[:, 0].tolist() == pytest.approx([0.9, 0.1])

    def test_scored_id_absent_from_pred(self):
        # an id with a confidence but zero voxels (reference predict_sz_rl
        # semantics: size 0, no matches) must not crash or steal a match
        pred, gt = _two_blob_volume()
        score = np.array([[5, 0.9], [7, 0.5], [9, 0.1]])
        rp, rfn, sc = seg_iou3d_sorted(pred, gt, score=score)
        assert rp[:, 0].tolist() == [5, 7, 9]
        row7 = rp[1]
        assert row7[1] == 0                       # size 0
        assert row7[2:].sum() == 0                # no matches in any band
        assert rp[0, 4] == pytest.approx(1.0)     # real matches unaffected
        assert rp[2, 4] == pytest.approx(1.0)
        assert len(rfn) == 0


class TestVOL3Deval:
    def _run(self, pred, gt, score=None, thresholds=(100,)):
        rng = default_area_ranges(thresholds)
        rp, rfn, sc = seg_iou3d_sorted(pred, gt, score, rng)
        ev = VOL3Deval(rp, rfn, sc)
        ev.params.areaRng = rng
        ev.params.areaRngLbl = ["all", "small", "medium"][: len(rng)]
        ev.accumulate()
        return ev.summarize(), ev

    def test_perfect_prediction_map_1(self):
        pred, gt = _two_blob_volume()
        stats, _ = self._run(pred, gt)
        assert stats[0] == pytest.approx(1.0)   # mAP
        assert stats[1] == pytest.approx(1.0)   # AP50
        assert stats[2] == pytest.approx(1.0)   # AP75

    def test_half_overlap_kills_high_iou(self):
        pred, gt = _two_blob_volume(shift=4)    # one pred at IoU 1/3
        stats, _ = self._run(pred, gt)
        assert stats[1] < 1.0                   # AP50: that pred is a FP
        assert 0.0 < stats[1] <= 0.6
        assert stats[2] < 1.0

    def test_high_scored_fp_hurts_more(self):
        pred, gt = _two_blob_volume()
        pred[:, 0:2, 0:8] = 7                   # pure FP blob
        lo = self._run(pred, gt, score=np.array(
            [[5, .9], [9, .8], [7, .99]]))[0]   # FP ranked first
        hi = self._run(pred, gt, score=np.array(
            [[5, .9], [9, .8], [7, .01]]))[0]   # FP ranked last
        assert hi[1] > lo[1]                    # COCO ranking sensitivity
        assert hi[1] == pytest.approx(1.0)      # FP after all TPs: AP intact

    def test_area_band_ap(self):
        pred, gt = _two_blob_volume()
        # band split at 100 voxels: gt1 = 256 voxels, gt2 = 576 -> both medium
        stats, ev = self._run(pred, gt, thresholds=(300 * 4,))
        # small band: gt1 (1024 vox < 1200), medium: gt2
        assert ev.eval["precision"].shape[2] == 3

    def test_matches_reference_transcription(self):
        """Full-path oracle: reference matching loop + COCO accumulate."""
        r = np.random.RandomState(0)
        gt = np.zeros((2, 40, 40), np.int32)
        pred = np.zeros_like(gt)
        gid = 1
        for i in range(6):
            cy, cx = r.randint(4, 36, 2)
            s = r.randint(2, 6)
            gt[:, cy - s:cy + s, cx - s:cx + s] = gid
            dy, dx = r.randint(-2, 3, 2)
            pred[:, cy - s + dy:cy + s + dy, cx - s + dx:cx + s + dx] = gid + 50
            gid += 1
        rng = default_area_ranges((60, 200))
        rp, rfn, sc = seg_iou3d_sorted(pred, gt, None, rng)

        # oracle: per-prediction loop (vol3d_util.py:202-235)
        pid, psz = np.unique(pred[pred > 0], return_counts=True)
        gidv, gsz = np.unique(gt[gt > 0], return_counts=True)
        order = np.argsort(-psz, kind="stable")
        todo, tsz = pid[order], psz[order]
        want = np.zeros((len(todo), 2 + 3 * len(rng)))
        want[:, 0], want[:, 1] = todo, tsz
        gt_best = np.zeros(gidv.max() + 1)
        gt_best_p = np.zeros(gidv.max() + 1, int)
        for j, i in enumerate(todo):
            m_id, m_sz = np.unique(gt * (pred == i), return_counts=True)
            keep = np.isin(m_id, gidv)
            m_id, m_sz = m_id[keep], m_sz[keep]
            if not len(m_id):
                continue
            g_sz = gsz[np.searchsorted(gidv, m_id)]
            ious = m_sz / (tsz[j] + g_sz - m_sz)
            for rr in range(len(rng)):
                sel = (g_sz > rng[rr, 0]) & (g_sz <= rng[rr, 1])
                if sel.sum() > 0:
                    k = np.argmax(ious * sel)
                    want[j, 2 + rr * 3:5 + rr * 3] = [m_id[k], g_sz[k], ious[k]]
            upd = gt_best[m_id] < ious
            gt_best[m_id[upd]] = ious[upd]
            gt_best_p[m_id[upd]] = i
        np.testing.assert_allclose(rp, want, atol=1e-12)

        fn_g = gidv[~np.isin(gidv, want[:, 2])]
        assert sorted(rfn[:, 2]) == sorted(fn_g)
        for row in rfn:
            assert row[4] == pytest.approx(gt_best[int(row[2])])
            assert row[0] == gt_best_p[int(row[2])]

    def test_evaluate_map_entry(self):
        pred, gt = _two_blob_volume()
        stats = evaluate_map(pred, gt, thresholds=(100, 400))
        assert stats.shape == (10,)
        assert stats[0] == pytest.approx(1.0)
