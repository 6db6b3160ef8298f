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
        # 16 variants add the z-flip and exist only for volumes (reference
        # test_augmentor.py: "applied to 2D outputs without the z-flip") —
        # in 2D only 8 spatial variants are distinct.
        self.num_aug = min(num_aug, 8)

    @classmethod
    def build_from_cfg(cls, cfg, activation: bool = False):
        num = cfg.INFERENCE.AUG_NUM if cfg.INFERENCE.AUG_NUM else 4
        mode = cfg.INFERENCE.AUG_MODE if cfg.INFERENCE.AUG_MODE else "mean"
        if mode in (None, "None"):
            mode = "mean"
        return cls(mode=mode, num_aug=int(num))

    def _variants(self):
        out = []
        for fy, fx in _FLIPS_4[: max(self.num_aug, 2)]:
            out.append((fy, fx, False))
        if self.num_aug == 8:
            for fy, fx in _FLIPS_4:
                out.append((fy, fx, True))
        return out[: self.num_aug]

    def __call__(self, forward: Callable[[np.ndarray], np.ndarray], images: np.ndarray) -> np.ndarray:
        """images: [B, H, W, C]; forward returns [B, ..., H', W']."""
        preds: List[np.ndarray] = []
        for fy, fx, tr in self._variants():
            x = images
            if fy:
                x = x[:, ::-1]
            if fx:
                x = x[:, :, ::-1]
            if tr:
                x = np.swapaxes(x, 1, 2)
            y = np.asarray(forward(np.ascontiguousarray(x)))
            if tr:
                y = np.swapaxes(y, -1, -2)
            if fx:
                y = y[..., ::-1]
            if fy:
                y = y[..., ::-1, :]
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
