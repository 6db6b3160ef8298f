"""Sliding-window volumetric inference with blended stitching.

Equivalent of the reference's chunked/sliding-window volume inference used
by the legacy EM path (``Trainer.test`` windowed accumulation with the
``data_blending`` matrices, and ``run_chunk``'s per-chunk orchestration —
engine/trainer.py:708-741; weights from data/utils/data_blending.py:6-53).
The reference's ``TileDataset``/``VolumeDataset`` sources were published
only as compiled bytecode (SURVEY.md section 2.5), so this rebuilds the
behavior as one generic utility:

* tile the volume with a regular stride grid whose last window is clamped
  to the volume border (every voxel covered, static window shape -> one
  XLA compilation for any volume size);
* weight each window's prediction with a gaussian/bump blending matrix and
  normalize by the accumulated weight.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import numpy as np

from ..data.seg_targets import build_blending_matrix


def _grid(vol: int, win: int, stride: int):
    if vol <= win:
        return [0]
    starts = list(range(0, vol - win, stride))
    starts.append(vol - win)  # clamp the last window to the border
    return starts


def sliding_window_inference(
    forward: Callable[[np.ndarray], np.ndarray],
    volume: np.ndarray,
    window: Sequence[int],
    stride: Sequence[int],
    out_channels: int,
    blending: str = "gaussian",
    batch_size: int = 1,
) -> np.ndarray:
    """Stitch windowed predictions over a [Z, Y, X, C_in] volume.

    ``forward`` maps a [B, *window, C_in] batch to [B, C_out, *window]
    logits/probabilities (the legacy models' channels-first output
    convention).  Returns [C_out, Z, Y, X].
    """
    window = tuple(window)
    stride = tuple(stride)
    assert volume.ndim == 4, "expect [Z, Y, X, C_in]"
    zyx = volume.shape[:3]
    weight = build_blending_matrix(window, blending)        # [*window]

    out = np.zeros((out_channels,) + zyx, np.float32)
    norm = np.zeros(zyx, np.float32)

    coords = [(z, y, x)
              for z in _grid(zyx[0], window[0], stride[0])
              for y in _grid(zyx[1], window[1], stride[1])
              for x in _grid(zyx[2], window[2], stride[2])]

    for i in range(0, len(coords), batch_size):
        chunk = coords[i : i + batch_size]
        crops = np.stack([
            volume[z : z + window[0], y : y + window[1], x : x + window[2]]
            for (z, y, x) in chunk
        ])
        if len(chunk) < batch_size:  # keep one static batch shape for jit
            pad = batch_size - len(chunk)
            crops = np.concatenate([crops, np.repeat(crops[-1:], pad, 0)])
        preds = np.asarray(forward(crops))[: len(chunk)]    # [b, C, *window]
        for (z, y, x), p in zip(chunk, preds):
            sl = (slice(z, z + window[0]), slice(y, y + window[1]),
                  slice(x, x + window[2]))
            out[(slice(None),) + sl] += p * weight
            norm[sl] += weight
    return out / np.maximum(norm, 1e-8)
