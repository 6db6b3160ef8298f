"""Padded, static-shape training targets.

The reference builds per-image Python lists of variable-length instance
tensors on the host every step (``prepare_intance_targets``,
engine/trainer.py:231-319).  Here targets are derived *inside jit* from the
integer instance label map: instances are padded to ``max_instances`` slots
with a validity mask, so every downstream op (matching, losses) is
static-shaped and stays on device.

Center points follow the reference exactly: the mean of each instance's
pixel coordinates, with *both* x and y normalized by the image width
(trainer.py:254-259 divides by ``inst_mask.shape[-1]``; all trained recipes
use square crops so this is also the height).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def targets_from_labels(
    labels: jnp.ndarray, max_instances: int, dtype=jnp.float32
) -> Dict[str, jnp.ndarray]:
    """labels: [B, H, W] int32 instance map with consecutive ids (0 = bg).

    Returns dict:
      masks         [B, G, H, W] float (0/1)
      valid         [B, G] bool
      center_points [B, G, 2] normalized (x, y)
      fg_mask       [B, H, W] float
      seg           [B, H, W] int32 (ids clipped to <= G)
    """
    B, H, W = labels.shape
    G = max_instances
    ids = jnp.arange(1, G + 1, dtype=labels.dtype)
    masks = (labels[:, None, :, :] == ids[None, :, None, None]).astype(dtype)
    areas = masks.sum(axis=(2, 3))
    valid = areas > 0

    xs = jnp.arange(W, dtype=dtype)[None, None, None, :]
    ys = jnp.arange(H, dtype=dtype)[None, None, :, None]
    cnt = jnp.maximum(areas, 1.0)
    cx = (masks * xs).sum(axis=(2, 3)) / cnt / W
    cy = (masks * ys).sum(axis=(2, 3)) / cnt / W  # both normalized by W, like the reference
    center_points = jnp.stack([cx, cy], axis=-1)

    return {
        "masks": masks,
        "valid": valid,
        "center_points": center_points,
        "fg_mask": (labels > 0).astype(dtype),
        "seg": jnp.where(labels > G, 0, labels).astype(jnp.int32),
    }
