"""Volume augmentation package tests (reference test strategy:
tests/test_augmentations.py — mixup/copy-paste smoke + numerical asserts;
extended to cover every augmentor's shape/determinism contract and the
Compose sample-size/crop bookkeeping)."""

import numpy as np
import pytest

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.data.volume_augment import (
    Compose,
    CopyPasteAugmentor,
    CutBlur,
    CutNoise,
    DataAugment,
    Elastic,
    Flip,
    Grayscale,
    MisAlignment,
    MissingParts,
    MissingSection,
    MixupAugmentor,
    MotionBlur,
    Rescale,
    Rotate,
    build_train_augmentor,
)

KW = {"additional_targets": {"label": "mask"}}


def _sample(z=8, y=64, x=64, seed=0):
    rs = np.random.RandomState(seed)
    img = rs.rand(z, y, x).astype(np.float32)
    lbl = (rs.rand(z, y, x) > 0.7).astype(np.int64) * rs.randint(
        1, 5, (z, y, x))
    return {"image": img, "label": lbl.astype(np.float32)}


SAME_SIZE_AUGS = [
    Flip(p=1.0, **KW),
    Rotate(p=1.0, rot90=True, **KW),
    Rotate(p=1.0, rot90=False, **KW),
    Rescale(p=1.0, **KW),
    Elastic(p=1.0, alpha=8.0, sigma=4.0, **KW),
    Grayscale(p=1.0, **KW),
    MissingParts(p=1.0, iterations=8, **KW),
    MotionBlur(p=1.0, kernel_size=5, **KW),
    CutBlur(p=1.0, **KW),
    CutNoise(p=1.0, **KW),
    CopyPasteAugmentor(p=1.0, **KW),
]


class TestAugmentors:
    @pytest.mark.parametrize("aug", SAME_SIZE_AUGS,
                             ids=lambda a: type(a).__name__)
    def test_shape_and_determinism(self, aug):
        s1 = aug(_sample(), np.random.RandomState(7))
        assert s1["image"].shape == (8, 64, 64)
        assert s1["label"].shape == (8, 64, 64)
        # determinism: same RandomState seed -> same output
        s2 = aug(_sample(), np.random.RandomState(7))
        np.testing.assert_array_equal(s1["image"], s2["image"])

    def test_flip_pairs_image_and_label(self):
        s = _sample()
        out = Flip(p=1.0, **KW)(dict(s), np.random.RandomState(3))
        # the same rule must be applied to both targets: flipping the output
        # back with the recorded relation preserves fg alignment
        fg_in = s["label"] > 0
        fg_out = out["label"] > 0
        assert fg_in.sum() == fg_out.sum()

    def test_missing_section_shrinks_z(self):
        aug = MissingSection(num_sections=2, p=1.0, **KW)
        out = aug(_sample(), np.random.RandomState(0))
        assert out["image"].shape[0] == 6
        assert out["label"].shape[0] == 6

    def test_grayscale_only_touches_images(self):
        s = _sample()
        out = Grayscale(p=1.0, **KW)(dict(s), np.random.RandomState(0))
        np.testing.assert_array_equal(out["label"], s["label"])

    def test_rotate90_label_nearest(self):
        s = _sample()
        out = Rotate(p=1.0, rot90=True, **KW)(dict(s), np.random.RandomState(1))
        # rot90 permutes labels without interpolation: same value histogram
        np.testing.assert_array_equal(np.sort(out["label"].ravel()),
                                      np.sort(s["label"].ravel()))

    def test_mixup(self):
        """Reference tests/test_augmentations.py mixup case."""
        vol = np.random.RandomState(0).rand(4, 1, 8, 32, 32).astype(np.float32)
        before = vol.copy()
        out = MixupAugmentor(num_aug=2)(vol.copy(), np.random.RandomState(5))
        assert out.shape == before.shape
        assert not np.array_equal(out, before)  # something was mixed


class TestCompose:
    def test_sample_size_inflation_and_crop(self):
        transforms = [
            Rotate(p=1.0, rot90=False, **KW),       # ratio 1.42 in xy
            Elastic(p=1.0, alpha=8.0, **KW),        # add 9 per side
            MisAlignment(p=1.0, displacement=8, **KW),
            MissingSection(p=1.0, num_sections=2, **KW),
            Flip(p=1.0, **KW),
        ]
        comp = Compose(transforms, input_size=(8, 32, 32), smooth=False, **KW)
        # flip removed from the main list, applied last (composition.py:62-76)
        assert comp.flip_aug is not None
        assert all(not isinstance(t, Flip) for t in comp.transforms)
        zs, ys, xs = comp.sample_size
        assert zs >= 8 + 2 and ys >= int(32 * 1.42) and xs >= int(32 * 1.42)

        rs = np.random.RandomState(11)
        sample = {
            "image": rs.rand(zs, ys, xs).astype(np.float32),
            "label": rs.randint(0, 4, (zs, ys, xs)).astype(np.float32),
        }
        out = comp(sample, np.random.RandomState(3))
        assert out["image"].shape == (8, 32, 32)
        assert out["label"].shape == (8, 32, 32)

    def test_smooth_masks(self):
        comp = Compose([], input_size=(2, 16, 16), smooth=True, **KW)
        rs = np.random.RandomState(0)
        lbl = np.zeros((2, 16, 16), np.float32)
        lbl[:, 4:12, 4:12] = 3.0
        out = comp({"image": rs.rand(2, 16, 16).astype(np.float32),
                    "label": lbl.copy()}, np.random.RandomState(1))
        assert set(np.unique(out["label"])) <= {0.0, 3.0}

    def test_build_from_cfg(self):
        cfg = get_cfg_defaults()
        cfg.defrost()
        # the augmented item comes back at MODEL.INPUT_SIZE (reference
        # build.py:161); OUTPUT_SIZE only governs the label crop
        cfg.MODEL.INPUT_SIZE = [4, 32, 32]
        aug = build_train_augmentor(cfg)
        assert len(aug.transforms) >= 5
        zs, ys, xs = aug.sample_size
        rs = np.random.RandomState(0)
        sample = {"image": rs.rand(zs, ys, xs).astype(np.float32),
                  "label": rs.randint(0, 3, (zs, ys, xs)).astype(np.float32)}
        out = aug(sample, np.random.RandomState(2))
        assert out["image"].shape == (4, 32, 32)


class TestTTA16:
    def test_16_variant_volumetric_identity(self):
        """16-variant TTA on a volume: an identity forward must reconstruct
        the input exactly for every variant (reference
        test_augmentor.py:25-120 supports xy flips/transpose + z-flip)."""
        from pctrans_tpu.data.tta import TestAugmentor

        tta = TestAugmentor(mode="mean", num_aug=16)
        rs = np.random.RandomState(0)
        vol = rs.rand(2, 4, 8, 8, 1).astype(np.float32)

        def forward(x):
            return x[..., 0]  # [B, D, H, W] prediction == input

        out = tta(forward, vol)
        np.testing.assert_allclose(out, vol[..., 0], rtol=1e-6)

    def test_16_folds_to_8_for_2d(self):
        from pctrans_tpu.data.tta import TestAugmentor

        tta = TestAugmentor(mode="mean", num_aug=16)
        calls = []

        def forward(x):
            calls.append(1)
            return x[..., 0]

        img = np.random.RandomState(0).rand(1, 8, 8, 1).astype(np.float32)
        out = tta(forward, img)
        assert len(calls) == 8  # z-flip is meaningless in 2D
        np.testing.assert_allclose(out, img[..., 0], rtol=1e-6)
