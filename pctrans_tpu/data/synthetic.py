"""Synthetic blob dataset: a drop-in fixture for CVPPP/BBBC-shaped data.

The reference has no test fixtures at all (SURVEY.md section 4); this
generator produces images of colored elliptical "leaves"/"nuclei" on a dark
background with consecutive-id instance label maps, enough for overfit
tests, e2e smoke runs and benchmarking without any data on disk.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def make_blob_image(
    rng: np.random.RandomState,
    size: Tuple[int, int] = (448, 448),
    n_instances: Tuple[int, int] = (4, 12),
    radius_px: Tuple[float, float] | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (image [H, W, 3] float32 ~N(0,1)-ish, label [H, W] int32).

    ``radius_px`` switches blob radii from image-relative fractions
    (leaf-like: few large instances) to absolute pixels (nucleus-like:
    size-independent blobs, so dense fields pack without clipping).
    """
    H, W = size
    n = rng.randint(n_instances[0], n_instances[1] + 1)
    label = np.zeros((H, W), np.int32)
    img = rng.randn(H, W, 3).astype(np.float32) * 0.05

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    next_id = 1
    for _ in range(n):
        cy = rng.uniform(0.1 * H, 0.9 * H)
        cx = rng.uniform(0.1 * W, 0.9 * W)
        if radius_px is not None:
            ry = rng.uniform(*radius_px)
            rx = rng.uniform(*radius_px)
        else:
            ry = rng.uniform(0.04, 0.12) * H
            rx = rng.uniform(0.04, 0.12) * W
        theta = rng.uniform(0, np.pi)
        ct, st = np.cos(theta), np.sin(theta)
        u = (xx - cx) * ct + (yy - cy) * st
        v = -(xx - cx) * st + (yy - cy) * ct
        mask = (u / rx) ** 2 + (v / ry) ** 2 < 1.0
        mask &= label == 0  # keep instances disjoint
        if mask.sum() < 20:
            continue
        label[mask] = next_id
        color = rng.uniform(0.3, 1.0, size=3).astype(np.float32)
        img[mask] = color + rng.randn(int(mask.sum()), 3).astype(np.float32) * 0.05
        next_id += 1

    # relabel consecutively (some blobs may have been skipped)
    ids = np.unique(label)
    remap = np.zeros(ids.max() + 1, np.int32)
    remap[ids] = np.arange(len(ids))
    label = remap[label]
    return img, label


class SyntheticDataset:
    """Finite synthetic dataset with deterministic content per index."""

    def __init__(self, size=(448, 448), length: int = 64, seed: int = 0,
                 n_instances=(4, 12), cache: bool = True, radius_px=None):
        self.size = tuple(size)
        self.length = length
        self.seed = seed
        self.n_instances = n_instances
        self.radius_px = radius_px
        # content is deterministic per index, so memoize: at the production
        # recipe the single host CPU otherwise regenerates each 448^2 image
        # (~tens of ms) every epoch and can starve the TPU train step
        self._cache: dict = {} if cache else None

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int):
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        rng = np.random.RandomState(self.seed * 100003 + idx)
        img, label = make_blob_image(rng, self.size, self.n_instances,
                                     radius_px=self.radius_px)
        item = {"image": img, "label": label}
        if self._cache is not None:
            self._cache[idx] = item
        return item


def batch_iterator(dataset, batch_size: int, rng: np.random.RandomState,
                   shuffle: bool = True) -> Iterator[dict]:
    """Infinite batch iterator yielding stacked numpy dicts."""
    n = len(dataset)
    while True:
        idx = rng.permutation(n) if shuffle else np.arange(n)
        for s in range(0, n - batch_size + 1, batch_size):
            items = [dataset[int(i)] for i in idx[s : s + batch_size]]
            yield {
                k: np.stack([it[k] for it in items]) for k in items[0]
            }
