"""Host-side instance-label helpers shared by every dataset."""

from __future__ import annotations

import numpy as np


def relabel_consecutive(seg: np.ndarray) -> np.ndarray:
    """Map instance labels to consecutive ids 1..K, preserving 0 = background.

    Equivalent of the reference's per-item relabeling (torch.unique at
    dataset_CVPPP.py:143-147, DATASET.REDUCE_LABEL for volumes) with one
    deliberate hardening: a crop that contains NO background keeps all of
    its instances (the naive unique->arange map sends the smallest present
    id to 0, silently erasing one instance into background on fully-labeled
    EM crops).
    """
    seg = np.asarray(seg)
    ids = np.unique(seg)
    fg = ids[ids != 0]
    lut = np.zeros(int(ids.max()) + 1 if ids.size else 1, np.int64)
    lut[fg] = np.arange(1, len(fg) + 1)
    out = lut[seg]
    dtype = seg.dtype if np.issubdtype(seg.dtype, np.integer) else np.int32
    return out.astype(dtype)
