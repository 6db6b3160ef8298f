"""Dataset dispatch + background-prefetching batch loader.

Equivalent of the reference's ``build_dataloader``
(connectomics/data/dataset/build.py:351-407): per-dataset dispatch by
``DATASET.DATA_TYPE``, train batch = SOLVER.SAMPLES_PER_BATCH, CVPPP val
batch 10, test batch = INFERENCE.SAMPLES_PER_BATCH.  Instead of torch
DataLoader worker processes, a thread pool decodes/augments ahead of the
step loop (image decode + cv2 augs release the GIL) and batches are handed
to jax as stacked numpy arrays.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .bbbc import BBBC
from .cvppp import CVPPP
from .synthetic import SyntheticDataset


def get_dataset(cfg, mode: str):
    dt = cfg.DATASET.DATA_TYPE
    root = cfg.DATASET.INPUT_PATH
    if dt == "CVPPP":
        size = cfg.MODEL.INPUT_SIZE[-1]
        return CVPPP(root, mode, crop_size=size)
    if dt == "BBBC":
        m = {"train": "train", "val": "validation", "test": "test"}[mode]
        return BBBC(root, m, crop_size=(512, 512))
    if dt == "synthetic":
        size = tuple(cfg.MODEL.INPUT_SIZE[-2:])
        length = 64 if mode == "train" else 8
        return SyntheticDataset(size=size, length=length,
                                seed={"train": 0, "val": 1, "test": 2}[mode])
    raise ValueError(f"Unknown DATASET.DATA_TYPE: {dt}")


def batch_size_for(cfg, mode: str, n_devices: int = 1) -> int:
    """Global batch size.  SOLVER.SAMPLES_PER_BATCH is per-device, like the
    reference's per-GPU batch (README.md:30-34: 2 img/GPU x 4 GPUs)."""
    if mode == "train":
        return cfg.SOLVER.SAMPLES_PER_BATCH * max(n_devices, 1)
    if mode == "val" and cfg.DATASET.DATA_TYPE == "CVPPP":
        return 10  # reference: data/dataset/build.py:361-362
    return cfg.INFERENCE.SAMPLES_PER_BATCH * max(n_devices, 1)


class PrefetchLoader:
    """Iterates batches forever (train) or one epoch (eval), decoding in a
    thread pool ``prefetch`` batches ahead."""

    def __init__(self, dataset, batch_size: int, shuffle: bool, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 2, drop_last: bool = True,
                 loop: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.loop = loop
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.prefetch = prefetch

    def _epoch_indices(self):
        n = len(self.dataset)
        idx = self.rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        stop = n - bs + 1 if self.drop_last else n
        for s in range(0, stop, bs):
            yield idx[s : s + bs]

    def _make_batch(self, indices) -> Dict[str, np.ndarray]:
        items = list(self.pool.map(self.dataset.__getitem__, [int(i) for i in indices]))
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        pending = []
        while True:
            for indices in self._epoch_indices():
                pending.append(self.pool.submit(self._make_batch, indices))
                while len(pending) > self.prefetch:
                    yield pending.pop(0).result()
            if not self.loop:
                break
        for f in pending:
            yield f.result()


def build_dataloader(cfg, mode: str, seed: int = 0, n_devices: int = 1) -> PrefetchLoader:
    ds = get_dataset(cfg, mode)
    return PrefetchLoader(
        ds,
        batch_size=batch_size_for(cfg, mode, n_devices),
        shuffle=(mode == "train"),
        seed=seed,
        num_workers=max(2, cfg.SYSTEM.NUM_CPUS // 2),
        loop=(mode == "train"),
        drop_last=(mode == "train"),
    )
