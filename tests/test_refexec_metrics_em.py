"""Legacy EM metrics parity vs the EXECUTED reference utils/evaluate.py.

adapted Rand error, VOI (split/merge) and binary Jaccard run unmodified
from /root/reference (pure numpy/scipy — no stubs needed) against this
repo's contingency-table reimplementations on identical label volumes.
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

from pctrans_tpu.inference import metrics_em as mine  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return load_ref("connectomics.utils.evaluate")


def _labels(rng, shape=(4, 24, 20), n=7):
    gt = rng.randint(0, n, size=shape).astype(np.int64)
    seg = gt.copy()
    # perturb: split one id, merge two others, add noise
    seg[(gt == 1) & (rng.rand(*shape) > 0.5)] = n
    seg[gt == 2] = 3
    flip = rng.rand(*shape) > 0.9
    seg[flip] = rng.randint(0, n + 1, size=int(flip.sum()))
    return seg, gt


def test_adapted_rand_matches_executed_reference(ref, rng):
    seg, gt = _labels(rng)
    np.testing.assert_allclose(mine.adapted_rand(seg, gt),
                               ref.adapted_rand(seg, gt), rtol=1e-10)
    a_all = mine.adapted_rand(seg, gt, all_stats=True)
    b_all = ref.adapted_rand(seg, gt, all_stats=True)
    np.testing.assert_allclose(np.asarray(a_all), np.asarray(b_all),
                               rtol=1e-10)


def test_voi_matches_executed_reference(ref, rng):
    seg, gt = _labels(rng)
    a_split, a_merge = mine.voi(seg, gt)
    b_split, b_merge = ref.voi(seg, gt)
    np.testing.assert_allclose([a_split, a_merge], [b_split, b_merge],
                               rtol=1e-10)


def test_binary_jaccard_matches_executed_reference(ref, rng):
    pred = rng.rand(3, 16, 16).astype(np.float32)
    gt = (rng.rand(3, 16, 16) > 0.5).astype(np.uint8)
    a = mine.get_binary_jaccard(pred, gt, thres=[0.4, 0.6])
    b = ref.get_binary_jaccard(pred, gt, thres=[0.4, 0.6])
    np.testing.assert_allclose(a, b, rtol=1e-6)
