"""Qualitative visualization of inputs / labels / predictions.

Equivalent of the reference ``Visualizer`` (connectomics/utils/
visualizer.py:15-192): compose the input image, the ground-truth instance
map and the predicted segmentation into one side-by-side panel and log it to
TensorBoard (or save it as PNG when TensorBoard is unavailable).  Instance
ids are colored with a fixed pseudo-random palette so the same id keeps its
color across iterations.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _palette(n: int = 256, seed: int = 7) -> np.ndarray:
    rs = np.random.RandomState(seed)
    pal = rs.randint(40, 255, (n, 3)).astype(np.uint8)
    pal[0] = 0  # background stays black
    return pal


_PALETTE = _palette()


def colorize_labels(labels: np.ndarray) -> np.ndarray:
    """[H, W] int instance map -> [H, W, 3] uint8 color image."""
    return _PALETTE[labels.astype(np.int64) % len(_PALETTE)]


def normalize_image(image: np.ndarray) -> np.ndarray:
    """[H, W, C] float image -> [H, W, 3] uint8 for display."""
    img = np.asarray(image, np.float32)
    lo, hi = float(img.min()), float(img.max())
    img = (img - lo) / (hi - lo + 1e-6)
    img = (img * 255).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, -1)
    return img[..., :3]


class Visualizer:
    """Panel writer: TensorBoard ``add_image`` when a writer is given, PNG
    files under ``<output_dir>/vis`` otherwise."""

    def __init__(self, output_dir: str, tb_writer=None, max_panels: int = 4):
        self.output_dir = os.path.join(output_dir, "vis")
        self.tb = tb_writer
        self.max_panels = max_panels

    def panel(self, image: np.ndarray, label: Optional[np.ndarray],
              pred: Optional[np.ndarray]) -> np.ndarray:
        parts = [normalize_image(image)]
        if label is not None:
            parts.append(colorize_labels(label))
        if pred is not None:
            parts.append(colorize_labels(pred))
        h = max(p.shape[0] for p in parts)
        parts = [np.pad(p, ((0, h - p.shape[0]), (0, 0), (0, 0)))
                 for p in parts]
        return np.concatenate(parts, axis=1)

    def visualize(self, iteration: int, images: np.ndarray,
                  labels: Optional[np.ndarray] = None,
                  preds: Optional[np.ndarray] = None,
                  tag: str = "val") -> None:
        """images [B, H, W, C]; labels/preds [B, H, W] instance maps."""
        n = min(self.max_panels, images.shape[0])
        for b in range(n):
            panel = self.panel(
                images[b],
                None if labels is None else labels[b],
                None if preds is None else preds[b],
            )
            if self.tb is not None:
                self.tb.add_image(f"{tag}/sample{b}", panel, iteration,
                                  dataformats="HWC")
            else:
                os.makedirs(self.output_dir, exist_ok=True)
                try:
                    from PIL import Image

                    Image.fromarray(panel).save(os.path.join(
                        self.output_dir, f"{tag}_{iteration:06d}_{b}.png"))
                except Exception:
                    np.save(os.path.join(
                        self.output_dir, f"{tag}_{iteration:06d}_{b}.npy"),
                        panel)
