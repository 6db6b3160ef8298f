"""Tests for the curvilinear CCQ metrics (scripts/tools/eval_curvilinear
equivalent): Zhang-Suen skeletonization, square dilation, CCQ protocol."""

import numpy as np
import pytest
from scipy import ndimage

from pctrans_tpu.inference.curvilinear import (
    binary_dilation_square,
    ccq,
    evaluate_pair,
    foreground_iou,
    skeletonize_zhang,
)


class TestDilation:
    def test_matches_scipy_square(self):
        rng = np.random.RandomState(0)
        for size in (3, 5, 7):
            mask = rng.rand(40, 37) > 0.9
            ours = binary_dilation_square(mask, size)
            ref = ndimage.binary_dilation(
                mask, structure=np.ones((size, size), bool))
            np.testing.assert_array_equal(ours, ref)

    def test_size_one_identity(self):
        mask = np.eye(5, dtype=bool)
        np.testing.assert_array_equal(binary_dilation_square(mask, 1), mask)


class TestSkeletonize:
    def test_thick_line_thins_to_single_pixel_width(self):
        img = np.zeros((20, 60), bool)
        img[8:13, 5:55] = True  # 5-px-thick horizontal bar
        skel = skeletonize_zhang(img)
        # every column of the interior has exactly one skeleton pixel
        cols = skel[:, 10:50].sum(axis=0)
        assert (cols == 1).all(), cols
        assert skel.sum() < img.sum() / 3

    def test_single_pixel_line_is_fixed_point(self):
        img = np.zeros((15, 15), bool)
        img[7, 2:13] = True
        skel = skeletonize_zhang(img)
        # endpoints may be trimmed but the line stays a connected 1-px line
        assert skel.sum() >= 9
        assert (skel.sum(axis=0) <= 1).all()

    def test_skeleton_subset_of_input(self):
        rng = np.random.RandomState(1)
        img = ndimage.binary_dilation(rng.rand(50, 50) > 0.97,
                                      iterations=2)
        skel = skeletonize_zhang(img)
        assert not (skel & ~img).any()

    def test_preserves_connectivity_of_a_cross(self):
        img = np.zeros((31, 31), bool)
        img[13:18, 3:28] = True
        img[3:28, 13:18] = True
        skel = skeletonize_zhang(img)
        lab, n = ndimage.label(skel, structure=np.ones((3, 3)))
        assert n == 1  # still one connected component


class TestCCQ:
    def test_perfect_prediction(self):
        img = np.zeros((40, 40), bool)
        img[20, 5:35] = True
        img[5:35, 20] = True
        cor, com, qua = ccq(img, img)
        assert cor == com == qua == 1.0

    def test_small_shift_within_tolerance(self):
        gt = np.zeros((40, 40), bool)
        gt[20, 5:35] = True
        pred = np.roll(gt, 2, axis=0)  # 2 px off, inside the 5x5 dilation
        cor, com, qua = ccq(pred, gt)
        assert cor > 0.9 and com > 0.9 and qua > 0.85

    def test_spurious_branch_lowers_correctness_only(self):
        gt = np.zeros((40, 40), bool)
        gt[20, 5:35] = True
        pred = gt.copy()
        pred[5:15, 10] = True  # extra branch far from GT
        cor, com, qua = ccq(pred, gt)
        assert com > 0.9          # GT still fully covered
        assert cor < 0.9          # extra skeleton pixels are false positives
        assert qua <= cor         # quality == cor when completeness is 1

    def test_missing_segment_lowers_completeness(self):
        gt = np.zeros((40, 40), bool)
        gt[20, 5:35] = True
        pred = gt.copy()
        pred[20, 22:35] = False
        cor, com, qua = ccq(pred, gt)
        assert cor > 0.9
        assert com < 0.8


class TestProtocol:
    def test_evaluate_pair_binarization_and_ignore(self):
        gt = np.zeros((30, 30), np.uint8)
        gt[10, 5:25] = 1
        gt[0, 0] = 255  # ignore label, must not count as foreground
        pred = np.zeros((30, 30), np.uint8)
        pred[10, 5:25] = 200  # above thres 128
        iou, cor, com, qua = evaluate_pair(pred, gt, thres=128)
        assert iou == 1.0 and cor == 1.0 and com == 1.0 and qua == 1.0

    def test_empty_gt_returns_ones(self):
        gt = np.zeros((10, 10), np.uint8)
        pred = np.full((10, 10), 255, np.uint8)
        assert evaluate_pair(pred, gt) == (1.0, 1.0, 1.0, 1.0)

    def test_foreground_iou(self):
        a = np.zeros((4, 4), bool)
        b = np.zeros((4, 4), bool)
        a[0, :2] = True
        b[0, 1:3] = True
        assert foreground_iou(a, b) == pytest.approx(1.0 / 3.0)
        assert foreground_iou(np.zeros((4, 4), bool),
                              np.zeros((4, 4), bool)) == 0.0
