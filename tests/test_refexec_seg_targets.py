"""Target/weight/blending generation parity vs the EXECUTED reference
data/utils modules.

``seg_to_targets`` (TARGET_OPT codes), ``seg_widen_border``,
``seg_to_instance_bd``, ``weight_binary_ratio``/``seg_to_weights``, the
affinity generators and the sliding-window blending matrices run
unmodified from /root/reference against `pctrans_tpu/data/seg_targets.py`
on identical label volumes.  Only numpy-pure reference paths are used as
oracles (the scipy-backed skimage shims in ref_exec exist for import
presence; grey-morphology border semantics differ subtly).
"""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("scipy")

# slow tier: executed-reference oracles run the reference's own code —
# on demand (pytest -m slow / -m ""), not the driver-facing fast tier
pytestmark = pytest.mark.slow
pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_exec import load_ref  # noqa: E402

from pctrans_tpu.data import seg_targets as mine  # noqa: E402


@pytest.fixture(scope="module")
def ref_seg():
    return load_ref("connectomics.data.utils.data_segmentation")


@pytest.fixture(scope="module")
def ref_weight():
    return load_ref("connectomics.data.utils.data_weight")


@pytest.fixture(scope="module")
def ref_blend():
    return load_ref("connectomics.data.utils.data_blending")


def _volume(rng, shape=(2, 24, 20), n=6):
    from pctrans_tpu.data.synthetic import make_blob_image

    vol = np.zeros(shape, np.int64)
    for z in range(shape[0]):
        _, lab = make_blob_image(rng, size=shape[1:], n_instances=(3, n))
        vol[z] = lab
    return vol


def test_seg_widen_border_matches(ref_seg, rng):
    seg = _volume(rng)
    np.testing.assert_array_equal(mine.seg_widen_border(seg.copy(), 1),
                                  ref_seg.seg_widen_border(seg.copy(), 1))


def test_seg_to_instance_bd_matches(ref_seg, rng):
    seg = _volume(rng)
    for do_bg in (True, False):
        a = mine.seg_to_instance_bd(seg.copy(), tsz_h=1, do_bg=do_bg)
        b = ref_seg.seg_to_instance_bd(seg.copy(), tsz_h=1, do_bg=do_bg)
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("topt", ["0", "1", "2", "3-25-2-0", "4-1-1",
                                  "4-1-0"])
def test_seg_to_targets_matches(ref_seg, rng, topt):
    seg = _volume(rng)
    a = mine.seg_to_targets(seg.copy(), [topt])
    b = ref_seg.seg_to_targets(seg.copy(), [topt])
    assert len(a) == len(b) == 1
    np.testing.assert_allclose(np.asarray(a[0], np.float64),
                               np.asarray(b[0], np.float64),
                               rtol=1e-6, atol=1e-6, err_msg=f"topt={topt}")


def test_weight_binary_ratio_matches(ref_weight, rng):
    seg = _volume(rng)
    binary = (seg > 0).astype(np.float32)
    np.testing.assert_allclose(mine.weight_binary_ratio(binary),
                               ref_weight.weight_binary_ratio(binary),
                               rtol=1e-6)
    # seg_to_weights: nested wopts per target (reference data_weight.py:9)
    a = mine.seg_to_weights([binary, binary], [["1"], ["0"]])
    b = ref_weight.seg_to_weights([binary, binary], [["1"], ["0"]])
    np.testing.assert_allclose(a[0][0], b[0][0], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a[1][0]), np.asarray(b[1][0]))


def test_blending_matrices_match(ref_blend):
    for mode in ("gaussian", "bump"):
        a = mine.build_blending_matrix((5, 17, 16), mode=mode)
        b = ref_blend.build_blending_matrix((5, 17, 16), mode=mode)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
