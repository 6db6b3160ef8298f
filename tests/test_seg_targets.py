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


class TestDiffusionGrads:
    """TARGET_OPT '7' vs a literal transcription of the reference
    masks2flows/extend_centers pixel-list algorithm
    (data_diffusion.py:26-130, torch gathers -> numpy fancy indexing)."""

    @staticmethod
    def _oracle_masks2flows(masks):
        from scipy import ndimage as ndi

        h, w = masks.shape
        masks_padded = np.pad(masks, 1).astype(np.int64)
        mu0 = np.zeros((2, h, w))
        centers = np.zeros((int(masks.max()), 2), "int")
        y, x = np.nonzero(masks_padded)
        nY = np.stack((y, y - 1, y + 1, y, y, y - 1, y - 1, y + 1, y + 1), 0)
        nX = np.stack((x, x, x, x - 1, x + 1, x - 1, x + 1, x - 1, x + 1), 0)
        slices = ndi.find_objects(masks)
        for i, si in enumerate(slices):
            if si is None:
                continue
            sr, sc = si
            yi, xi = np.nonzero(masks[sr, sc] == (i + 1))
            yi = yi.astype(np.int32) + 1
            xi = xi.astype(np.int32) + 1
            ymed, xmed = np.median(yi), np.median(xi)
            imin = np.argmin((xi - xmed) ** 2 + (yi - ymed) ** 2)
            centers[i, 0] = yi[imin] + sr.start
            centers[i, 1] = xi[imin] + sc.start
        nm = masks_padded[nY, nX]
        isneigh = nm == nm[0]
        ext = np.array([[s[0].stop - s[0].start + 1, s[1].stop - s[1].start + 1]
                        for s in slices if s is not None])
        if len(ext) == 0:
            return mu0
        n_iter = 2 * (ext.sum(axis=1)).max()
        T = np.zeros((h + 2, w + 2), np.float64)
        for _ in range(n_iter):
            T[centers[:, 0], centers[:, 1]] += 1
            Tneigh = T[nY, nX] * isneigh
            T[nY[0], nX[0]] = Tneigh.mean(axis=0)
        T = np.log1p(T)
        dy = T[nY[2], nX[2]] - T[nY[1], nX[1]]
        dx = T[nY[4], nX[4]] - T[nY[3], nX[3]]
        mu = np.stack((dy, dx))
        mu /= 1e-20 + (mu ** 2).sum(axis=0) ** 0.5
        mu0[:, y - 1, x - 1] = mu
        return mu0

    def _blobs(self, seed=0, shape=(24, 20), n=4):
        r = np.random.RandomState(seed)
        lbl = np.zeros(shape, np.int32)
        for i in range(n):
            cy, cx = r.randint(2, shape[0] - 2), r.randint(2, shape[1] - 2)
            ry, rx = r.randint(2, 5), r.randint(2, 5)
            yy, xx = np.ogrid[: shape[0], : shape[1]]
            blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1
            lbl[blob & (lbl == 0)] = i + 1
        return lbl

    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_pixel_list_oracle(self, seed):
        from pctrans_tpu.data.diffusion import masks2flows

        lbl = self._blobs(seed=seed)
        got = masks2flows(lbl)[0]
        want = self._oracle_masks2flows(lbl)
        np.testing.assert_allclose(got, want, atol=1e-10)
        assert np.abs(got).max() > 0.5  # flows actually exist

    def test_missing_label_id(self):
        """A skipped id (reference: `si is None`) must not corrupt flows."""
        from pctrans_tpu.data.diffusion import masks2flows

        lbl = self._blobs(seed=1)
        lbl[lbl == 2] = 0  # id 2 absent, id 3+ still present
        got = masks2flows(lbl)[0]
        want = self._oracle_masks2flows(lbl)
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_empty_and_3d_and_dispatch(self):
        from pctrans_tpu.data.diffusion import seg2diffgrads

        assert seg2diffgrads(np.zeros((8, 8), np.int32)).shape == (2, 8, 8)
        lbl3 = np.stack([self._blobs(0), self._blobs(1)])
        out3 = seg2diffgrads(lbl3)
        assert out3.shape == (2, 2, 24, 20)
        np.testing.assert_allclose(out3[:, 1], seg2diffgrads(lbl3[1]),
                                   atol=1e-6)
        # seg_to_targets dispatch, incl. the '7-0' mask-channel variant
        outs = st.seg_to_targets(self._blobs(2), ["7", "7-0"])
        assert outs[0].shape == (2, 24, 20)
        assert outs[1].shape == (3, 24, 20)
        np.testing.assert_array_equal(outs[1][2], self._blobs(2) > 0)


class TestTargetRankConsistency:
    def test_diffgrads_keep_z_axis(self):
        """TARGET_OPT '7' on a z=1 volume must return [C, 1, y, x] like
        every other target option — a squeezed [C, y, x] gets its channel
        axis mis-slotted as z by VolumeDataset._finalize_shape."""
        from pctrans_tpu.data.seg_targets import seg_to_targets

        lab = np.zeros((1, 16, 16), np.int64)
        lab[0, 4:10, 4:10] = 1
        (grads,) = seg_to_targets(lab, ["7"])
        assert grads.shape == (2, 1, 16, 16)
        (combo,) = seg_to_targets(lab, ["7-0"])
        assert combo.shape == (3, 1, 16, 16)
        # pure-2D labels keep the 2D convention
        (g2,) = seg_to_targets(lab[0], ["7"])
        assert g2.shape == (2, 16, 16)

    def test_edt_on_2d_label(self):
        """TARGET_OPT '5' accepts 2D labels (same wrap as branch '4')."""
        from pctrans_tpu.data.seg_targets import seg_to_targets

        lab = np.zeros((16, 16), np.int64)
        lab[4:10, 4:10] = 1
        (edt,) = seg_to_targets(lab, ["5"])
        assert edt.shape[-2:] == (16, 16)
        assert np.isfinite(edt).all()
