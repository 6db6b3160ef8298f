"""Multi-scale deformable attention core (pure JAX).

TPU-native equivalent of the reference CUDA kernel
(connectomics/model/maskformer_block/pixel_decoder/ops/src/cuda/
ms_deform_im2col_cuda.cuh) and its grid_sample-based torch fallback
(ops/functions/ms_deform_attn_func.py:52-72): for every query, head and
feature level, bilinearly sample ``n_points`` locations from the flattened
value map and blend them with softmax attention weights.

The sampling grid follows torch ``grid_sample(align_corners=False,
padding_mode='zeros')`` on ``grid = 2*loc - 1``: pixel position =
``loc * size - 0.5``, out-of-bounds corners contribute zero.

Shapes (L levels, static ``spatial_shapes``):
  value:              [B, S, M, D]     S = sum(H_l * W_l)
  sampling_locations: [B, Lq, M, L, P, 2]   normalized (x, y) in [0, 1]
  attention_weights:  [B, Lq, M, L, P]
  returns:            [B, Lq, M * D]

On TPU this lowers to vectorized gathers + FMAs; XLA fuses the corner
blending.  A Pallas kernel (ops/msdeform_pallas.py) is an optional drop-in
for large token counts.  Gradients come from JAX AD (the gather/bilinear
expression is differentiable in value, locations and weights), which unlike
the reference's atomicAdd-based CUDA backward is deterministic.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn_core(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    out = jnp.zeros((B, Lq, M, D), dtype=value.dtype)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]                     # [B, HW, M, D]
        v = jnp.swapaxes(v, 1, 2)                               # [B, M, HW, D]
        loc = sampling_locations[:, :, :, lid]                  # [B, Lq, M, P, 2]
        w = attention_weights[:, :, :, lid]                     # [B, Lq, M, P]
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        sampled = _bilinear_gather(v, x, y, H, W)               # [B, Lq, M, P, D]
        out = out + jnp.einsum("bqmpd,bqmp->bqmd", sampled, w.astype(sampled.dtype))
        start += H * W
    return out.reshape(B, Lq, M * D)


def _bilinear_gather(v: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, H: int, W: int):
    """Gather bilinear samples.

    v: [B, M, HW, D]; x, y: [B, Lq, M, P] continuous pixel coords.
    Returns [B, Lq, M, P, D] with zeros outside the map.
    """
    B, M, _, D = v.shape
    _, Lq, _, P = x.shape

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(v.dtype)
    ty = (y - y0).astype(v.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)   # [B, Lq, M, P]
        idx_m = jnp.transpose(idx, (0, 2, 1, 3)).reshape(B, M, Lq * P)
        g = jnp.take_along_axis(v, idx_m[..., None], axis=2)        # [B, M, Lq*P, D]
        g = g.reshape(B, M, Lq, P, D).transpose(0, 2, 1, 3, 4)      # [B, Lq, M, P, D]
        return g * (w * valid.astype(v.dtype))[..., None]

    return (
        corner(x0i, y0i, (1 - tx) * (1 - ty))
        + corner(x0i + 1, y0i, tx * (1 - ty))
        + corner(x0i, y0i + 1, (1 - tx) * ty)
        + corner(x0i + 1, y0i + 1, tx * ty)
    )
