"""Target-generation / weight / affinity / EDT / blending tests.

Oracles are literal transcriptions of the reference formulas
(data_affinity.py:71-123 slicing form, data_weight.py:33-72) plus
constructed-geometry checks for the window-filter rewrites
(seg_widen_border, seg_to_instance_bd vs the reference's im2col patches)."""

import numpy as np
import pytest

from pctrans_tpu.data import seg_targets as st


def _labels3d(seed=0, shape=(2, 16, 16), k=4):
    return np.random.RandomState(seed).randint(0, k, shape)


class TestSegHelpers:
    def test_widen_border_marks_contacts(self):
        seg = np.zeros((1, 8, 8), np.int32)
        seg[0, :, :4] = 1
        seg[0, :, 4:] = 2  # direct contact at column 3|4
        out = st.seg_widen_border(seg, 1)
        assert (out[0, :, 3] == 0).all() and (out[0, :, 4] == 0).all()
        assert (out[0, :, 0] == 1).all() and (out[0, :, 7] == 2).all()

    def test_instance_bd(self):
        seg = np.zeros((1, 8, 8), np.int32)
        seg[0, 2:6, 2:6] = 1
        bd = st.seg_to_instance_bd(seg, 1, do_bg=True)
        assert bd[0, 2, 2] == 1      # object border
        assert bd[0, 4, 4] == 0      # interior
        assert bd[0, 0, 0] == 0      # far background
        # without bg contours, a lone object has no instance-instance border
        bd2 = st.seg_to_instance_bd(seg, 1, do_bg=False)
        assert bd2.sum() == 0

    def test_seg2polarity(self):
        lbl = np.array([[[0, 1], [2, 3]]])
        out = st.seg2polarity(lbl, "1")
        assert out.shape == (3, 1, 2, 2)
        np.testing.assert_array_equal(out[0, 0], [[0, 1], [0, 1]])  # odd ids
        np.testing.assert_array_equal(out[1, 0], [[0, 0], [1, 0]])  # even ids
        exc = st.seg2polarity(lbl, "1-1")
        np.testing.assert_array_equal(exc[0], [[0, 1], [2, 1]])


def _aff_oracle(seg):
    """Literal transcription of data_affinity.py:71-113 for 3D nhood=3."""
    nhood = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, -1]])
    shape = seg.shape
    aff = np.zeros((3,) + shape, np.float32)
    for e in range(3):
        s = [slice(max(0, -nhood[e, d]), min(shape[d], shape[d] - nhood[e, d]))
             for d in range(3)]
        t = [slice(max(0, nhood[e, d]), min(shape[d], shape[d] + nhood[e, d]))
             for d in range(3)]
        a, b = seg[tuple(s)], seg[tuple(t)]
        aff[(e,) + tuple(s)] = ((a == b) * (a > 0) * (b > 0)).astype(np.float32)
    aff[0, 0] = (seg[0] > 0).astype(np.float32)
    aff[1, :, 0] = (seg[:, 0] > 0).astype(np.float32)
    aff[2, :, :, 0] = (seg[:, :, 0] > 0).astype(np.float32)
    return aff


class TestAffinity:
    def test_matches_reference_formula(self):
        seg = _labels3d(seed=3, shape=(3, 8, 8))
        np.testing.assert_array_equal(st.seg_to_aff(seg), _aff_oracle(seg))

    def test_2d(self):
        seg = np.array([[1, 1, 0], [1, 2, 2], [0, 2, 2]])
        aff = st.seg_to_aff(seg)
        assert aff.shape == (2, 3, 3)
        assert aff[1, 0, 1] == 1  # (0,1)-(0,0) same id 1
        assert aff[1, 1, 1] == 0  # (1,1)=2 vs (1,0)=1


class TestWeights:
    def test_binary_ratio_balances(self):
        lbl = np.zeros((1, 16, 16), np.float32)
        lbl[0, :4] = 1  # 25% fg
        w = st.weight_binary_ratio(lbl)
        # reference math: ww=0.25, factor=3 -> fg weighted 3, bg 1
        assert w[0, 0, 0] == pytest.approx(3.0)
        assert w[0, 8, 8] == pytest.approx(1.0)

    def test_binary_ratio_uniform(self):
        assert (st.weight_binary_ratio(np.ones((1, 4, 4))) == 1).all()

    def test_unet2d_border_weights(self):
        seg = np.zeros((32, 32), np.int32)
        seg[4:14, 4:14] = 1
        seg[4:14, 18:28] = 2
        w = st.weight_unet2d(seg, w0=10.0, w1=5.0, sigma=5)
        assert w[8, 8] == pytest.approx(5.0)       # inside an instance
        assert w[8, 16] > w[31, 31]                # between > far corner
        assert w.max() <= 10.0 and w.min() >= 1.0

    def test_seg_to_weights_dispatch(self):
        tgt = [np.zeros((1, 4, 4), np.float32)]
        tgt[0][0, 0, 0] = 1
        out = st.seg_to_weights(tgt, [["1", "0"]])
        assert out[0][0].shape == tgt[0].shape
        assert out[0][1].shape == (1,)  # '0' -> placeholder


class TestEDT:
    def test_semantic_edt_range_and_sign(self):
        lbl = np.zeros((16, 16), np.int32)
        lbl[4:12, 4:12] = 1
        d = st.edt_semantic(lbl, "2d")
        assert d.max() <= 1.0 and d.min() >= -1.0
        assert d[8, 8] > 0 and d[0, 0] < 0

    def test_instance_edt_quantized_bins(self):
        """Reference energy_quantize (data_transform.py:138-149): int bins,
        energy 0 -> class 1, peak energy -> class ``levels``."""
        lbl = np.zeros((1, 16, 16), np.int32)
        lbl[0, 4:12, 4:12] = 1
        q = st.edt_instance(lbl, "2d", quantize=True)
        assert q.shape == (1, 16, 16) and q.dtype == np.int64
        assert q[0, 0, 0] == 1          # background energy 0 -> bin 1
        assert q[0, 8, 8] == 10         # instance center -> top bin
        assert q.min() >= 0 and q.max() <= 10

    def test_targets_dispatch(self):
        lbl = _labels3d(seed=5, shape=(2, 16, 16))
        outs = st.seg_to_targets(lbl, ["0", "2", "4-1-1", "6", "9"])
        assert outs[0].shape == (1, 2, 16, 16)
        assert outs[1].shape == (3, 2, 16, 16)
        assert outs[2].shape == (1, 2, 16, 16)
        assert outs[3].shape == (1, 2, 16, 16)
        assert outs[4].dtype == np.int64


class TestBlending:
    @pytest.mark.parametrize("mode", ["gaussian", "bump"])
    def test_blending_matrix(self, mode):
        w = st.build_blending_matrix((4, 16, 16), mode)
        assert w.shape == (4, 16, 16)
        assert w.min() > 0
        # center outweighs the corner
        assert w[2, 8, 8] > w[0, 0, 0]
