"""Test-time augmentation (flip/transpose ensemble).

Equivalent of the reference ``TestAugmentor``
(connectomics/data/augmentation/test_augmentor.py:25-120): 4, 8 or 16
variants built from xy flips (+ transpose), predictions inverse-transformed
and blended by mean / min / max.  The reference's CVPPP/BBBC eval paths
construct it but call the model directly (engine/trainer.py:78-81); it is
provided here for parity and for the volumetric path.

Operates on NHWC batches; the forward function maps images -> per-pixel
predictions [B, C, H, W]-like arrays whose trailing two axes are spatial.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np


_FLIPS_4 = [(False, False), (False, True), (True, False), (True, True)]


class TestAugmentor:
    def __init__(self, mode: str = "mean", num_aug: int = 4):
        assert mode in ("mean", "min", "max")
        assert num_aug in (2, 4, 8, 16)
        self.mode = mode
        # 16 variants add the z-flip (volumes only; for 2D inputs the z-flip
        # duplicates each spatial variant, so __call__ folds 16 -> 8 there).
        self.num_aug = num_aug

    @classmethod
    def build_from_cfg(cls, cfg, activation: bool = False):
        num = cfg.INFERENCE.AUG_NUM if cfg.INFERENCE.AUG_NUM else 4
        mode = cfg.INFERENCE.AUG_MODE if cfg.INFERENCE.AUG_MODE else "mean"
        if mode in (None, "None"):
            mode = "mean"
        return cls(mode=mode, num_aug=int(num))

    def _variants(self, volumetric: bool):
        n_spatial = min(self.num_aug, 8)
        out = []
        for fy, fx in _FLIPS_4[: max(n_spatial, 2)]:
            out.append((False, fy, fx, False))
        if n_spatial == 8:
            for fy, fx in _FLIPS_4:
                out.append((False, fy, fx, True))
        out = out[:n_spatial]
        if self.num_aug == 16 and volumetric:
            out = out + [(True, fy, fx, tr) for (_, fy, fx, tr) in out]
        return out

    def __call__(self, forward: Callable[[np.ndarray], np.ndarray], images: np.ndarray) -> np.ndarray:
        """images: [B, H, W, C] or volumetric [B, D, H, W, C]; forward
        returns [B, ..., H', W'] (trailing two axes spatial, z at -3 for
        volumes)."""
        volumetric = images.ndim == 5
        sp = (2, 3) if volumetric else (1, 2)  # spatial axes of the input
        preds: List[np.ndarray] = []
        for fz, fy, fx, tr in self._variants(volumetric):
            x = images
            if fz:
                x = np.flip(x, 1)
            if fy:
                x = np.flip(x, sp[0])
            if fx:
                x = np.flip(x, sp[1])
            if tr:
                x = np.swapaxes(x, sp[0], sp[1])
            y = np.asarray(forward(np.ascontiguousarray(x)))
            if tr:
                y = np.swapaxes(y, -1, -2)
            if fx:
                y = y[..., ::-1]
            if fy:
                y = y[..., ::-1, :]
            if fz:
                y = np.flip(y, -3)
            preds.append(y)
        stack = np.stack(preds)
        if self.mode == "mean":
            return stack.mean(axis=0)
        if self.mode == "min":
            return stack.min(axis=0)
        return stack.max(axis=0)

    def update_name(self, name: str) -> str:
        """Tag output filenames with the TTA configuration (reference
        test_augmentor.update_name semantics)."""
        base, dot, ext = name.rpartition(".")
        return f"{base}_aug{self.num_aug}{self.mode}{dot}{ext}" if dot else f"{name}_aug{self.num_aug}{self.mode}"
