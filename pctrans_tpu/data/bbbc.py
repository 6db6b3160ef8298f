"""BBBC039 nuclei dataset.

Mirrors the reference loader (connectomics/data/dataset/dataset_BBBC.py:
47-224): metadata/{training,validation,test}.txt splits, min-max image
normalization, reflect-pad 30, random 572^2 crop, an augmentation mix of
flip / rotation / elastic / grayscale each applied with p=0.5 inside an 0.8
gate (dataset_BBBC.py:56-67,149-152), then a center crop to 512^2 and
replication of the single gray channel to 3.  Test mode returns the
full-resolution 520x696 image.

The augmentations reimplement the reference's augmentation_BBBC package
(flip.py, rotation.py, warp.py, grayscale.py) in numpy/cv2.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from scipy.ndimage import gaussian_filter

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


# ------------------------------------------------------------- augmentations
def aug_flip(rng: np.random.RandomState, img: np.ndarray, label: np.ndarray):
    """Random y/x reflection + xy transpose (augmentation_BBBC/flip.py)."""
    rule = rng.randint(2, size=4)
    for arr_idx, arr in enumerate((img, label)):
        if rule[0]:
            arr = arr[::-1, :]
        if rule[1]:
            arr = arr[:, ::-1]
        if rule[2]:
            arr = arr.transpose(1, 0)
        if arr_idx == 0:
            img = arr
        else:
            label = arr
    return np.ascontiguousarray(img), np.ascontiguousarray(label)


def aug_rotate(rng: np.random.RandomState, img: np.ndarray, label: np.ndarray):
    """Continuous xy rotation (augmentation_BBBC/rotation.py)."""
    import cv2

    h, w = img.shape[-2:]
    # cv2 conventions: center is (x, y) = (w/2, h/2) and dsize is (w, h) —
    # the reference passed (height, width), which only works for the square
    # 572x572 crop (same fix as volume_augment.Rotate)
    M = cv2.getRotationMatrix2D((w / 2, h / 2), rng.rand() * 360.0, 1)
    img = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT)
    label = cv2.warpAffine(label.astype(np.float32), M, (w, h),
                           flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT)
    return img, label


def aug_elastic(rng: np.random.RandomState, img: np.ndarray, label: np.ndarray,
                alpha: float = 16.0, sigma: float = 4.0):
    """Elastic deformation (augmentation_BBBC/warp.py, Simard 2003 style)."""
    import cv2

    h, w = img.shape[-2:]
    dx = np.float32(gaussian_filter(rng.rand(h, w) * 2 - 1, sigma) * alpha)
    dy = np.float32(gaussian_filter(rng.rand(h, w) * 2 - 1, sigma) * alpha)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    mapx = np.float32(x + dx)
    mapy = np.float32(y + dy)
    img = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
    label = cv2.remap(label.astype(np.float32), mapx, mapy, cv2.INTER_NEAREST,
                      borderMode=cv2.BORDER_CONSTANT)
    return img, label


def aug_grayscale(rng: np.random.RandomState, img: np.ndarray,
                  contrast: float = 0.3, brightness: float = 0.3):
    """Contrast/brightness jitter + gamma (augmentation_BBBC/grayscale.py,
    3D mode on a single slice)."""
    ran = rng.rand(3)
    out = img * (1 + (ran[0] - 0.5) * contrast)
    out = out + (ran[1] - 0.5) * brightness
    out = np.clip(out, 0, 1)
    return out ** (2.0 ** (ran[2] * 2 - 1))


def center_crop_2d(image: np.ndarray, det_shape=(512, 512)) -> np.ndarray:
    """Reflect-pad 10 then center crop (dataset_BBBC.py:216-224)."""
    image = np.pad(image, ((10, 10), (10, 10)), mode="reflect")
    s0 = (image.shape[0] - det_shape[0]) // 2
    s1 = (image.shape[1] - det_shape[1]) // 2
    return image[s0 : s0 + det_shape[0], s1 : s1 + det_shape[1]]


def _read_image(path: str) -> np.ndarray:
    img = Image.open(path)
    return np.asarray(img).astype(np.float32)


class BBBC:
    """mode: 'train' | 'validation' | 'test'.

    Directory layout (reference dataset_BBBC.py:82-105):
      <root>/images/*.tif, <root>/label_instance/*.png,
      <root>/metadata/{training,validation,test}.txt
    """

    def __init__(self, root: str, mode: str, crop_size=(512, 512), seed: int = 0,
                 padding: int = 30):
        assert mode in ("train", "validation", "test")
        self.mode = mode
        self.root = root
        self.crop_size = tuple(crop_size)
        self.padding = padding
        meta = {"train": "training.txt", "validation": "validation.txt",
                "test": "test.txt"}[mode]
        meta_path = os.path.join(root, "metadata", meta)
        with open(meta_path) as f:
            self.ids = [x.strip()[:-4] if x.strip().endswith(".png") else x.strip()
                        for x in f if x.strip()]
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.ids)

    def _load_pair(self, idx: int):
        name = self.ids[idx]
        img = _read_image(os.path.join(self.root, "images", name + ".tif"))
        img = (img - img.min()) / max(img.max() - img.min(), 1e-8)
        label = np.asarray(
            Image.open(os.path.join(self.root, "label_instance", name + ".png"))
        ).astype(np.int32)
        return img, label

    def __getitem__(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict[str, np.ndarray]:
        img, label = self._load_pair(idx)
        if self.mode == "test":
            return {
                "image": np.repeat(img[:, :, None], 3, axis=2).astype(np.float32),
                "label": label,
            }
        if self.mode == "validation":
            img = np.pad(img, ((92, 92), (4, 4)), mode="constant")
            label = np.pad(label, ((92, 92), (4, 4)), mode="constant")
            return {
                "image": np.repeat(img[:, :, None], 3, axis=2).astype(np.float32),
                "label": label,
            }

        if rng is None:  # loader passes a per-(epoch, index) stream; see build.py
            rng = self._rng
        pad = self.padding
        img = np.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
        label = np.pad(label, ((pad, pad), (pad, pad)), mode="reflect")
        ch = self.crop_size[0] + 2 * pad
        cw = self.crop_size[1] + 2 * pad
        rx = rng.randint(0, img.shape[0] - ch + 1)
        ry = rng.randint(0, img.shape[1] - cw + 1)
        img = img[rx : rx + ch, ry : ry + cw]
        label = label[rx : rx + ch, ry : ry + cw]

        if rng.rand() < 0.8:
            if rng.rand() > 0.5:
                img, label = aug_flip(rng, img, label)
            if rng.rand() > 0.5:
                img, label = aug_rotate(rng, img, label)
            if rng.rand() > 0.5:
                img, label = aug_elastic(rng, img, label)
            if rng.rand() > 0.5:
                img = aug_grayscale(rng, img)

        img = center_crop_2d(img, self.crop_size)
        label = center_crop_2d(label, self.crop_size)
        from .cvppp import relabel_consecutive

        return {
            "image": np.repeat(img[:, :, None], 3, axis=2).astype(np.float32),
            "label": relabel_consecutive(label.astype(np.int32)),
        }
