"""Tests for instance postprocessing."""

import numpy as np
import pytest

from pctrans_tpu.inference.postprocess import (
    instance_inference_bbbc,
    instance_inference_cvppp,
    mask_nms,
    mask_post,
    paint_ascending_area,
    pairwise_dice_binary,
    merge_small_object,
)


def make_probs(Q, H, W):
    return np.zeros((Q, H, W), np.float32)


class TestMaskPost:
    def test_duplicate_queries_are_merged(self):
        m = np.zeros((3, 16, 16), np.float32)
        m[0, 2:8, 2:8] = 1
        m[1, 2:8, 2:8] = 1        # duplicate of 0
        m[2, 10:14, 10:14] = 1    # distinct
        out = mask_post(m, thres1=0.5, thres2=0.6, bd_flag=True)
        assert out.shape[0] == 2

    def test_cluster_mean_rebinarized(self):
        m = np.zeros((2, 8, 8), np.float32)
        m[0, 0:4] = 1
        m[1, 0:3] = 1  # dice with m0 = 2*24/(32+24) ~ 0.857 > 0.5 -> merged
        out = mask_post(m, thres1=0.5, thres2=0.6, bd_flag=True)
        assert out.shape[0] == 1
        # mean is 1.0 on rows 0-2 (kept) and 0.5 on row 3 (dropped at 0.6)
        assert out[0, 0:3].all() and not out[0, 3:].any()


class TestMaskNMS:
    def test_contained_mask_suppressed(self):
        big = np.zeros((16, 16), np.float32)
        big[2:14, 2:14] = 1
        small = np.zeros((16, 16), np.float32)
        small[4:10, 4:10] = 1  # fully inside big -> MMI = 1
        masks = np.stack([big, small])
        scores = np.array([1.0, 0.5])
        out = mask_nms(masks, scores, thres=0.72)
        assert out.shape[0] == 1
        np.testing.assert_array_equal(out[0], big)

    def test_disjoint_masks_kept(self):
        a = np.zeros((16, 16), np.float32)
        a[:4, :4] = 1
        b = np.zeros((16, 16), np.float32)
        b[8:, 8:] = 1
        out = mask_nms(np.stack([a, b]), np.array([1.0, 0.9]), thres=0.72)
        assert out.shape[0] == 2


class TestPaint:
    def test_smaller_instance_wins_overlap(self):
        big = np.zeros((8, 8), np.float32)
        big[:, :] = 1
        small = np.zeros((8, 8), np.float32)
        small[2:4, 2:4] = 1
        seg = paint_ascending_area(np.stack([big, small]))
        # small sorted first (label 1), wins its overlap region
        assert (seg[2:4, 2:4] == 1).all()
        assert seg[0, 0] == 2

    def test_background_zero(self):
        m = np.zeros((1, 8, 8), np.float32)
        m[0, 2:4, 2:4] = 1
        seg = paint_ascending_area(m)
        assert seg[0, 0] == 0 and seg[2, 2] == 1


class TestEndToEnd:
    def test_cvppp_pipeline_recovers_instances(self):
        H = W = 64
        probs = make_probs(5, H, W)
        probs[0, 5:25, 5:25] = 0.95     # leaf 1
        probs[1, 6:25, 5:26] = 0.93     # duplicate detection of leaf 1
        probs[2, 35:60, 35:60] = 0.9    # leaf 2
        probs[3, 2:4, 2:4] = 0.9        # too small (area 4 < 40)
        seg = instance_inference_cvppp(probs)
        ids = set(np.unique(seg)) - {0}
        assert len(ids) == 2
        assert seg[10, 10] != 0 and seg[40, 40] != 0
        assert seg[10, 10] != seg[40, 40]

    def test_bbbc_pipeline(self):
        probs = make_probs(4, 64, 64)
        probs[0, 5:20, 5:20] = 0.9
        probs[1, 30:50, 30:50] = 0.8
        seg = instance_inference_bbbc(probs)
        assert len(set(np.unique(seg)) - {0}) == 2

    def test_empty_prediction(self):
        seg = instance_inference_cvppp(make_probs(3, 32, 32))
        assert (seg == 0).all()


class TestMergeSmallObject:
    def test_tiny_instance_absorbed(self):
        # needs >= 3 unique values in the window (bg + neighbor + tiny id),
        # mirroring the reference's len(temp_uc) > 2 guard (trainer.py:768)
        seg = np.zeros((16, 16), np.int64)
        seg[2:8, 2:14] = 1
        seg[9, 7] = 2  # single pixel at the edge of instance 1, bg below
        out = merge_small_object(seg.copy())
        assert (out != 2).all()
        assert out[9, 7] == 1

    def test_border_crumb_not_merged(self):
        """Reference parity (trainer.py:761-766): a crumb within window//2 of
        the top/left border produces a negative slice start, hence an empty
        crop and NO merge — behavior pinned for the CodaLab output path."""
        seg = np.zeros((16, 16), np.int64)
        seg[2:8, 2:14] = 1
        seg[0, 3] = 2  # centroid row 0 -> pos_x = -2 -> empty crop
        out = merge_small_object(seg.copy())
        assert out[0, 3] == 2

    def test_fully_enclosed_tiny_instance_kept(self):
        # only 2 unique values in the window -> reference leaves it alone
        seg = np.zeros((16, 16), np.int64)
        seg[2:14, 2:14] = 1
        seg[7, 7] = 2
        out = merge_small_object(seg.copy())
        assert out[7, 7] == 2
