"""Oracle tests for pctrans_tpu.utils.analysis (reference
connectomics/utils/analysis.py:13-195)."""

import numpy as np
import pytest

from pctrans_tpu.utils.analysis import (diff_segm, distance_nn,
                                        instance_centers, pixel_intensity,
                                        voxel_instance_size)


def _ref_diff_segm(seg1, seg2, iou_thres=0.75):
    """Literal transcription of the reference diff_segm loop
    (analysis.py:123-195), minus the bbox-crop streaming (same math:
    only overlapping idx2 can set best_iou because IoU must be > 0)."""
    ids1, counts1 = np.unique(seg1, return_counts=True)
    c1 = dict(zip(ids1.tolist(), counts1.tolist()))
    ids2, counts2 = np.unique(seg2, return_counts=True)
    c2 = dict(zip(ids2.tolist(), counts2.tolist()))
    ids1 = ids1[ids1 != 0]
    ids2 = ids2[ids2 != 0]
    results = {"seg1_unique": [], "seg2_unique": [], "shared1": [],
               "shared2": []}
    if len(ids1) == 0:
        results["seg2_unique"] = list(ids2)
        return results
    if len(ids2) == 0:
        results["seg1_unique"] = list(ids1)
        return results
    for idx1 in ids1:
        m1 = seg1 == idx1
        best_iou, matched = 0.0, None
        for idx2 in np.unique(seg2[m1]):
            if idx2 == 0:
                continue
            overlap = int((m1 & (seg2 == idx2)).sum())
            iou = overlap / float(c1[idx1] + c2[idx2] - overlap)
            if iou > best_iou:
                best_iou, matched = iou, idx2
        if best_iou < iou_thres or matched is None:
            results["seg1_unique"].append(idx1)
        else:
            results["shared1"].append(idx1)
            results["shared2"].append(matched)
    results["seg2_unique"] = list(set(ids2) - set(results["shared2"]))
    return results


class TestInstanceStats:
    def test_voxel_instance_size(self):
        t = np.array([[0, 1, 1], [2, 2, 2], [0, 0, 5]])
        df = voxel_instance_size(t, ds_name="x")
        assert list(df.index) == [1, 2, 5]
        assert list(df["Size"]) == [2, 3, 1]
        assert set(df["Dataset"]) == {"x"}

    def test_instance_centers_match_scipy(self):
        from scipy.ndimage import center_of_mass

        rng = np.random.RandomState(0)
        t = rng.randint(0, 6, (7, 9, 11))
        ids = np.unique(t)
        ids = ids[ids != 0]
        ref = np.array(center_of_mass((t != 0).astype(np.uint8), t,
                                      list(ids)))
        got = instance_centers(t)
        assert np.allclose(got, ref)

    def test_instance_centers_resolution(self):
        t = np.zeros((4, 4), np.int32)
        t[1, 2] = 3
        got = instance_centers(t, resolution=(2.0, 0.5))
        assert np.allclose(got, [[2.0, 1.0]])

    def test_distance_nn(self):
        t = np.zeros((10, 10), np.int32)
        t[0, 0] = 1        # center (0, 0)
        t[0, 4] = 2        # center (0, 4)
        t[9, 9] = 3        # center (9, 9)
        df = distance_nn(t, resolution=(1.0, 1.0))
        d = np.asarray(df["NN_Distance"])
        assert d[0] == pytest.approx(4.0)
        assert d[1] == pytest.approx(4.0)
        assert d[2] == pytest.approx(np.hypot(9, 5))

    def test_pixel_intensity(self):
        src = np.arange(6).reshape(2, 3).astype(float)
        tgt = np.array([[0, 1, 0], [2, 0, 3]])
        fg = pixel_intensity(src, tgt, "foreground")
        bg = pixel_intensity(src, tgt, "background")
        assert sorted(fg["Intensity"]) == [1.0, 3.0, 5.0]
        assert sorted(bg["Intensity"]) == [0.0, 2.0, 4.0]
        with pytest.raises(AssertionError):
            pixel_intensity(src, tgt, "forground")


class TestDiffSegm:
    def test_identical_maps_all_shared(self):
        rng = np.random.RandomState(1)
        s = rng.randint(0, 5, (12, 12))
        r = diff_segm(s, s, iou_thres=0.75)
        ids = sorted(np.unique(s[s > 0]).tolist())
        assert sorted(r["shared1"]) == ids
        assert sorted(r["shared2"]) == ids
        assert r["seg1_unique"] == [] and r["seg2_unique"] == []

    def test_empty_sides(self):
        z = np.zeros((4, 4), np.int32)
        s = np.array([[0, 1], [2, 2]])
        r = diff_segm(z, s)
        assert sorted(r["seg2_unique"]) == [1, 2] and r["shared1"] == []
        r = diff_segm(s, np.zeros_like(s))
        assert sorted(r["seg1_unique"]) == [1, 2] and r["shared2"] == []

    @pytest.mark.parametrize("trial", range(12))
    def test_matches_reference_loop(self, trial):
        rng = np.random.RandomState(trial)
        shape = (rng.randint(6, 14), rng.randint(6, 14))
        s1 = rng.randint(0, 6, shape) * rng.choice([1, 3])
        s2 = rng.randint(0, 6, shape) * rng.choice([1, 7])
        thres = rng.choice([0.3, 0.5, 0.75])
        got = diff_segm(s1, s2, iou_thres=thres)
        ref = _ref_diff_segm(s1, s2, iou_thres=thres)
        for k in ("seg1_unique", "shared1", "shared2", "seg2_unique"):
            assert sorted(got[k]) == sorted(map(int, ref[k])), (k, got, ref)
        # shared pairs must correspond elementwise
        assert dict(zip(got["shared1"], got["shared2"])) == {
            int(a): int(b) for a, b in zip(ref["shared1"], ref["shared2"])}
