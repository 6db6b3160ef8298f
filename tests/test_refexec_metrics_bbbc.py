"""BBBC metrics parity vs the EXECUTED reference metrics_bbbc.py.

AJI (with the reference's greedy matching + used-prediction quirk,
preserved by specification in this repo — metrics_bbbc.py:8-13), binary
pixel-F1, PQ/detection-F1 at IoU 0.5, and remap_label all run unmodified
from /root/reference (numexpr/sklearn/tqdm shimmed in ref_exec) against
this repo's contingency-table implementations on identical label maps.
"""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("scipy")

# slow tier: executed-reference oracles run the reference's own code —
# on demand (pytest -m slow / -m ""), not the driver-facing fast tier
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_exec import load_ref  # noqa: E402

from pctrans_tpu.inference import metrics_bbbc as mine  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return load_ref("connectomics.inference.evaluation.metrics_bbbc")


def _instance_maps(rng, size=(64, 56)):
    from pctrans_tpu.data.synthetic import make_blob_image

    _, gt = make_blob_image(rng, size=size, n_instances=(5, 9))
    # prediction: perturbed copy with a split, a miss, and an extra blob
    pred = gt.copy()
    n = int(gt.max())
    pred[(gt == 1) & (np.arange(size[1])[None, :] > size[1] // 2)] = n + 1
    pred[gt == 2] = 0
    pred[2:8, 2:8] = n + 2
    flip = rng.rand(*size) > 0.95
    pred[flip] = 0
    return gt.astype(np.uint16), pred.astype(np.uint16)


def test_remap_label_matches_executed_reference(ref, rng):
    _, pred = _instance_maps(rng)
    # punch holes in the id space
    pred = pred.astype(np.int64) * 3
    np.testing.assert_array_equal(mine.remap_label(pred),
                                  ref.remap_label(pred))
    np.testing.assert_array_equal(mine.remap_label(pred, by_size=True),
                                  ref.remap_label(pred, by_size=True))


def test_aji_matches_executed_reference(ref, rng):
    gt, pred = _instance_maps(rng)
    a = mine.agg_jc_index(gt, pred)
    b = ref.agg_jc_index(gt, pred)
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_pixel_f1_matches_executed_reference(ref, rng):
    gt, pred = _instance_maps(rng)
    np.testing.assert_allclose(mine.pixel_f1(gt, pred),
                               ref.pixel_f1(gt, pred), rtol=1e-10)


def test_fast_pq_matches_executed_reference(ref, rng):
    gt, pred = _instance_maps(rng)
    gt_r = ref.remap_label(gt)
    pred_r = ref.remap_label(pred)
    (b_dq, b_sq, b_pq), b_sets = ref.get_fast_pq(gt_r, pred_r)
    (a_dq, a_sq, a_pq), a_sets = mine.get_fast_pq(gt_r, pred_r)
    np.testing.assert_allclose([a_dq, a_sq, a_pq], [b_dq, b_sq, b_pq],
                               rtol=1e-10)
    for a, b in zip(a_sets, b_sets):
        np.testing.assert_array_equal(np.sort(np.asarray(a).ravel()),
                                      np.sort(np.asarray(b).ravel()))
