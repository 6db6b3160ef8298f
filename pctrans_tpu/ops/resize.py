"""Resizing helpers matching torch ``F.interpolate`` semantics.

* ``resize_bilinear`` = bilinear, align_corners=False (half-pixel centers) —
  this is what ``jax.image.resize`` implements when antialiasing is off.
* ``resize_nearest_torch`` = torch's legacy 'nearest' (floor of source index),
  which differs from jax's rounding 'nearest'; needed where the reference
  downsamples label maps (e.g. maskformer_criterion.py:294).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of the trailing two axes (align_corners=False)."""
    out_shape = x.shape[:-2] + tuple(size)
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False)


def resize_nearest_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize matching torch's legacy index rule src = floor(dst*scale)."""
    H, W = x.shape[-2:]
    out_h, out_w = size
    if H % out_h == 0 and W % out_w == 0:
        # integer downsample ratio: floor(i * r) == i * r exactly, so the
        # gather is a strided slice (the advanced-index form lowers to a
        # dynamic gather that costs ~0.2 ms/step against the train batch's
        # [B, 448, 448] label maps)
        return x[..., :: H // out_h, :: W // out_w]
    rows = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[..., rows[:, None], cols[None, :]]
