"""Cellpose / MoNuSeg instance-segmentation datasets.

Equivalents of the reference ``CellposeDataset`` / ``MoNuSegDataset``
(connectomics/data/dataset/dataset_cellpose.py / dataset_monuseg.py —
published only as compiled bytecode; file-naming contract and the
CVPPP-style training chain recovered from the bytecode constants:
``*_masks.png`` pairs for cellpose, ``images/{}`` + ``labels/{}_ins.npy``
for MoNuSeg, seed-paired RandomH/VFlip + RandomResizedCrop(scale 0.7-1.0)
+ ImageNet normalization like dataset_CVPPP.py:103-147).

Both yield the same NHWC item dict as :class:`~pctrans_tpu.data.cvppp.CVPPP`
so the PCTrans trainer consumes them unchanged.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np

from .cvppp import (
    normalize_image, random_resized_crop_params, relabel_consecutive, _resize,
)


class _InstanceFolderDataset:
    """Shared train/eval plumbing: paired flips + RandomResizedCrop on
    train; full-resolution normalized image + relabeled instances on
    val/test."""

    def __init__(self, mode: str, crop_size: int = 448, seed: int = 0):
        assert mode in ("train", "val", "test")
        self.mode = mode
        self.crop_size = crop_size
        self._rng = np.random.RandomState(seed)
        self.items = []  # list of (image_path, label_path)

    def __len__(self):
        return len(self.items)

    def _load_pair(self, idx: int):
        raise NotImplementedError

    def __getitem__(self, idx: int,
                    rng: Optional[np.random.RandomState] = None
                    ) -> Dict[str, np.ndarray]:
        rgb, label = self._load_pair(idx)
        if self.mode != "train":
            return {"image": normalize_image(rgb),
                    "label": relabel_consecutive(label)}
        if rng is None:
            rng = self._rng
        if rng.rand() < 0.5:
            rgb, label = rgb[:, ::-1], label[:, ::-1]
        if rng.rand() < 0.5:
            rgb, label = rgb[::-1], label[::-1]
        H, W = label.shape[:2]
        i, j, h, w = random_resized_crop_params(rng, H, W)
        rgb = _resize(np.ascontiguousarray(rgb[i:i + h, j:j + w]),
                      self.crop_size, nearest=False)
        label = _resize(np.ascontiguousarray(label[i:i + h, j:j + w]),
                        self.crop_size, nearest=True)
        return {"image": normalize_image(rgb),
                "label": relabel_consecutive(label)}


class CellposeDataset(_InstanceFolderDataset):
    """<root>/{train,test}/ with ``<stem>_img.png`` + ``<stem>_masks.png``
    pairs (the public cellpose layout; val reuses the test split like the
    reference's two-folder datasets)."""

    def __init__(self, root: str, mode: str, crop_size: int = 448,
                 seed: int = 0):
        super().__init__(mode, crop_size, seed)
        sub = "train" if mode == "train" else "test"
        d = os.path.join(root, sub)
        masks = sorted(glob.glob(os.path.join(d, "*_masks.png")))
        self.items = [(m.replace("_masks.png", "_img.png"), m) for m in masks]

    def _load_pair(self, idx: int):
        from PIL import Image

        ip, lp = self.items[idx]
        rgb = np.asarray(Image.open(ip).convert("RGB"))
        label = np.asarray(Image.open(lp)).astype(np.int64)
        return rgb, label


class MoNuSegDataset(_InstanceFolderDataset):
    """<root>/images/<stem>.(png|tif) + <root>/labels/<stem>_ins.npy
    instance arrays (MICCAI MoNuSeg nuclei; the reference also reads
    ``_300``-suffixed rescaled variants — both stems are accepted)."""

    def __init__(self, root: str, mode: str, crop_size: int = 448,
                 seed: int = 0):
        super().__init__(mode, crop_size, seed)
        img_dir = os.path.join(root, "images")
        lab_dir = os.path.join(root, "labels")
        paths = sorted(p for p in glob.glob(os.path.join(img_dir, "*"))
                       if os.path.isfile(p))
        items = []
        for p in paths:
            stem = os.path.splitext(os.path.basename(p))[0]
            for cand in (f"{stem}_ins.npy", f"{stem}_300_ins.npy"):
                lp = os.path.join(lab_dir, cand)
                if os.path.exists(lp):
                    items.append((p, lp))
                    break
        # deterministic 80/20 train/val split over the sorted listing
        n_val = max(1, len(items) // 5) if items else 0
        if mode == "train":
            self.items = items[n_val:]
        else:
            self.items = items[:n_val] if mode == "val" else items

    def _load_pair(self, idx: int):
        from PIL import Image

        ip, lp = self.items[idx]
        rgb = np.asarray(Image.open(ip).convert("RGB"))
        label = np.load(lp).astype(np.int64)
        if rgb.shape[:2] != label.shape[:2]:
            # '_300_ins.npy' labels were exported at a rescaled resolution;
            # bring the image to the label's frame so crops stay aligned
            # (a crop computed in label space over a full-res image covers
            # a different physical region)
            rgb = _resize(rgb, label.shape[:2], nearest=False)
        return rgb, label
