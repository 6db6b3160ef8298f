"""Legacy EM metric + postprocessing tests.

Oracles: literal transcriptions of the reference formulas
(connectomics/utils/evaluate.py adapted_rand:11-78, vi_tables:155-208) run
in-test on small random label volumes; the watershed zoo is tested on
constructed geometries (two touching blobs must split along the probability
valley)."""

import numpy as np
import pytest

from pctrans_tpu.inference import metrics_em as em
from pctrans_tpu.inference import postprocess_em as pp


def _random_labels(shape=(4, 16, 16), k=5, seed=0):
    rs = np.random.RandomState(seed)
    return rs.randint(0, k, shape)


def _adapted_rand_oracle(seg, gt):
    """Literal transcription of evaluate.py:11-78 (sparse form)."""
    import scipy.sparse as sparse

    segA = np.ravel(gt)
    segB = np.ravel(seg)
    n = segA.size
    n_a = int(np.amax(segA)) + 1
    n_b = int(np.amax(segB)) + 1
    p_ij = sparse.csr_matrix((np.ones(n, int), (segA, segB)),
                             shape=(n_a, n_b))
    a = p_ij[1:n_a, :]
    b = p_ij[1:n_a, 1:n_b]
    c = p_ij[1:n_a, 0].todense()
    d = b.multiply(b)
    a_i = np.array(a.sum(1))
    b_i = np.array(b.sum(0))
    sumA = np.sum(a_i * a_i)
    sumB = np.sum(b_i * b_i) + (np.sum(c) / n)
    sumAB = np.sum(d) + (np.sum(c) / n)
    precision = sumAB / sumB
    recall = sumAB / sumA
    return 1.0 - 2.0 * precision * recall / (precision + recall)


class TestEMMetrics:
    def test_adapted_rand_matches_reference_formula(self):
        seg = _random_labels(seed=1)
        gt = _random_labels(seed=2)
        ours = em.adapted_rand(seg, gt)
        assert ours == pytest.approx(_adapted_rand_oracle(seg, gt), rel=1e-9)

    def test_adapted_rand_perfect(self):
        gt = _random_labels(seed=3)
        assert em.adapted_rand(gt, gt) == pytest.approx(0.0, abs=1e-9)

    def test_voi_perfect_and_symmetry(self):
        gt = _random_labels(seed=4) + 1  # no zero label -> nothing ignored
        split, merge = em.voi(gt, gt, ignore_groundtruth=[])
        assert split == pytest.approx(0.0, abs=1e-9)
        assert merge == pytest.approx(0.0, abs=1e-9)

    def test_voi_oversegmentation_is_split(self):
        gt = np.zeros((1, 8, 8), np.int64) + 1
        seg = np.ones((1, 8, 8), np.int64)
        seg[..., 4:] = 2  # one GT object split in two
        split, merge = em.voi(seg, gt, ignore_groundtruth=[])
        assert split > 0.9 and merge == pytest.approx(0.0, abs=1e-9)

    def test_binary_jaccard(self):
        rs = np.random.RandomState(0)
        pred = rs.rand(4, 16, 16)
        gt = (rs.rand(4, 16, 16) > 0.5).astype(int)
        score = em.get_binary_jaccard(pred, gt, [0.3, 0.5])
        assert score.shape == (2, 4)
        tp, fp, tn, fn = em.confusion_matrix(pred, gt, 0.5)
        assert score[1, 2] == pytest.approx(tp / (tp + fp))
        assert score[1, 3] == pytest.approx(tp / (tp + fn))


def _two_blob_volume():
    """Two gaussian-ish blobs with a probability valley between them."""
    z, y, x = 2, 24, 48
    yy, xx = np.mgrid[0:y, 0:x]
    c1 = np.exp(-(((yy - 12) ** 2) / 40 + ((xx - 12) ** 2) / 40))
    c2 = np.exp(-(((yy - 12) ** 2) / 40 + ((xx - 36) ** 2) / 40))
    sem = np.clip(c1 + c2, 0, 1)
    vol = np.repeat((sem * 255).astype(np.uint8)[None], z, axis=0)
    return vol[None]  # [C=1, Z, Y, X]


class TestWatershedZoo:
    def test_binary_connected_merges_touching(self):
        vol = _two_blob_volume()
        seg = pp.binary_connected(vol, thres=0.04, thres_small=0)
        assert seg.max() == 1  # low threshold: blobs touch -> one component

    def test_binary_watershed_splits_valley(self):
        vol = _two_blob_volume()
        seg = pp.binary_watershed(vol, thres1=0.9, thres2=0.3, thres_small=0,
                                  seed_thres=1)
        assert seg.max() == 2  # two seeds -> two basins
        # left and right blob centers get different labels
        assert seg[0, 12, 12] != seg[0, 12, 36]
        assert seg[0, 12, 12] > 0 and seg[0, 12, 36] > 0

    def test_bc_watershed(self):
        vol = _two_blob_volume()
        boundary = np.zeros_like(vol[0])
        boundary[:, :, 22:26] = 255  # contour wall between the blobs
        stacked = np.stack([vol[0], boundary])
        seg = pp.bc_watershed(stacked, thres1=0.6, thres2=0.5, thres3=0.3,
                              thres_small=0, seed_thres=1)
        assert seg.max() == 2

    def test_bcd_watershed(self):
        vol = _two_blob_volume()
        boundary = np.zeros_like(vol[0])
        boundary[:, :, 22:26] = 255
        distance = np.full_like(vol[0], 255)  # signed EDT ~ +1 everywhere
        stacked = np.stack([vol[0], boundary, distance])
        seg = pp.bcd_watershed(stacked, thres1=0.6, thres2=0.5, thres3=0.3,
                               thres_small=0, seed_thres=1)
        assert seg.max() == 2

    def test_remove_small_instances_neighbor(self):
        seg = np.zeros((1, 8, 8), np.int32)
        seg[0, :4] = 1
        seg[0, 4:, :2] = 2  # small instance adjacent to 1 and 3
        seg[0, 4:, 2:] = 3
        out = pp.remove_small_instances(seg, thres_small=10, mode="neighbor")
        assert 2 not in out
        assert (out > 0).sum() == (seg > 0).sum()  # absorbed, not deleted

    def test_polarity2instance(self):
        pre = np.zeros((2, 16, 16), np.uint8)
        post = np.zeros_like(pre)
        pre[:, 4:8, 4:8] = 255
        post[:, 8:12, 4:8] = 255
        union = np.maximum(pre, post)
        seg = pp.polarity2instance(np.stack([pre, post, union]),
                                   thres_small=0)
        assert set(np.unique(seg)) == {0, 1, 2}  # synapse 1: pre=1, post=2
        sem = pp.polarity2instance(np.stack([pre, post, union]),
                                   thres_small=0, semantic=True)
        assert set(np.unique(sem)) == {0, 1, 2}


class TestVol3dAP:
    def test_perfect_prediction(self):
        from pctrans_tpu.inference.vol3d_ap import evaluate_ap

        gt = np.zeros((2, 16, 16), np.int32)
        gt[:, :8, :8] = 1
        gt[:, 8:, 8:] = 2
        ap75, ap50, av, m = evaluate_ap(gt.copy(), gt)
        assert ap75 == 1.0 and ap50 == 1.0 and av == 1.0
        assert m["general"]["Pred -> GT/Ref TP"] == 2
        assert m["general"]["Pred -> GT/Ref FP"] == 0

    def test_half_overlap(self):
        from pctrans_tpu.inference.vol3d_ap import evaluate_ap

        gt = np.zeros((1, 8, 16), np.int32)
        gt[0, :, :8] = 1
        pred = np.zeros_like(gt)
        pred[0, :, 4:12] = 1  # IoU = 4/12 = 1/3 with gt
        ap75, ap50, av, m = evaluate_ap(pred, gt)
        assert ap50 == 0.0  # best IoU 1/3 <= 0.5 -> FP + FN
        assert m["confusion_matrix"]["th_0_5"]["AP_FP"] == 1
        assert m["confusion_matrix"]["th_0_5"]["AP_FN"] == 1

    def test_ap_formula_matches_reference(self):
        """AP = precision*recall with TP/FP from per-pred best IoU and FN
        from per-GT best IoU (evaluate_ap.py:396-430)."""
        from pctrans_tpu.inference.vol3d_ap import evaluate_ap

        rs = np.random.RandomState(0)
        gt = rs.randint(0, 5, (2, 24, 24))
        pred = gt.copy()
        pred[rs.rand(*pred.shape) < 0.3] = rs.randint(0, 5)
        ap75, ap50, av, m = evaluate_ap(pred, gt)
        cm = m["confusion_matrix"]["th_0_5"]
        p = cm["AP_TP"] / max(1, cm["AP_TP"] + cm["AP_FP"])
        r = cm["AP_TP"] / max(1, cm["AP_TP"] + cm["AP_FN"])
        assert cm["AP"] == pytest.approx(p * r)
        assert 0.0 <= av <= 1.0


class TestSlidingWindow:
    def test_identity_reconstruction(self):
        """An identity forward must reconstruct the volume exactly despite
        overlapping windows and boundary clamping (blending normalizes)."""
        from pctrans_tpu.inference.sliding_window import sliding_window_inference

        rs = np.random.RandomState(0)
        vol = rs.rand(5, 20, 22, 1).astype(np.float32)

        def forward(x):  # [B, z, y, x, 1] -> [B, 1, z, y, x]
            return np.transpose(x, (0, 4, 1, 2, 3))

        out = sliding_window_inference(forward, vol, window=(4, 8, 8),
                                       stride=(2, 5, 6), out_channels=1,
                                       batch_size=3)
        np.testing.assert_allclose(out[0], vol[..., 0], rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("blending", ["gaussian", "bump"])
    def test_full_coverage(self, blending):
        from pctrans_tpu.inference.sliding_window import sliding_window_inference

        vol = np.ones((3, 9, 11, 2), np.float32)

        def forward(x):
            return np.ones((x.shape[0], 4) + x.shape[1:4], np.float32)

        out = sliding_window_inference(forward, vol, window=(2, 4, 4),
                                       stride=(2, 4, 4), out_channels=4,
                                       blending=blending)
        np.testing.assert_allclose(out, np.ones_like(out), rtol=1e-4)


class TestVOIIgnoreSemantics:
    def test_ignore_is_by_raw_label_value(self):
        """ignore_y takes RAW label values (gala/reference semantics), not
        remapped contingency rows: ignoring GT label 255 must drop its
        voxels even though it remaps to row 2."""
        from pctrans_tpu.inference.metrics_em import split_vi

        gt = np.zeros((4, 8), np.int64)
        gt[:, :3] = 3
        gt[:, 3:] = 255
        seg = gt.copy()
        seg[:2, 3:] = 7          # split label 255 into two
        seg[2:, 3:] = 9
        # without ignores the split of 255 costs conditional entropy
        h1 = split_vi(seg, gt)
        assert h1[1] > 0
        # ignoring 255 (and bg 0) leaves only the perfectly-matched label 3
        h2 = split_vi(seg, gt, ignore_x=(0,), ignore_y=(0, 255))
        assert h2 == (0.0, 0.0)

    def test_sparse_contingency_matches_dense_rand(self):
        from pctrans_tpu.inference.metrics_em import adapted_rand

        rs = np.random.RandomState(0)
        gt = rs.randint(0, 6, (6, 10, 10))
        seg = gt.copy()
        seg[gt == 3] = rs.randint(6, 8, int((gt == 3).sum()))
        err, prec, rec = adapted_rand(seg, gt, all_stats=True)
        assert 0.0 <= err <= 1.0 and 0.0 < prec <= 1.0 and 0.0 < rec <= 1.0
