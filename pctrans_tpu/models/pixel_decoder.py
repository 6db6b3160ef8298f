"""MSDeformAttn pixel decoder (flax, NHWC).

Equivalent of the reference ``MSDeformAttnPixelDecoder``
(maskformer_block/pixel_decoder/msdeformattn.py:164-360): project res3-5 to
``conv_dim`` channels, run a 6-layer deformable-attention encoder over the
concatenated flattened levels, reshape back to maps, then fuse res2 through
one FPN stage to produce stride-4 ``mask_features``.

Levels are ordered low-resolution first (res5, res4, res3), matching the
reference's top-down iteration (msdeformattn.py:319).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.msdeform import ms_deform_attn
from ..ops.resize import resize_bilinear
from .layers import ConvNorm, position_embedding_sine, remat_policy

_XAVIER = nn.initializers.xavier_uniform()


def _sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional bias init for sampling offsets (ms_deform_attn.py:66-74):
    head h points along angle 2*pi*h/n_heads, scaled by the point index."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [heads, 2]
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for i in range(n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention module (ops/modules/ms_deform_attn.py:34-125)."""

    d_model: int = 128
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    train: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,               # [B, Lq, C]
        reference_points: jnp.ndarray,    # [B, Lq, L, 2] normalized (x, y), f32
        input_flatten: jnp.ndarray,       # [B, S, C]
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        B, Lq, _ = query.shape
        S = input_flatten.shape[1]
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // M

        value = nn.Dense(self.d_model, kernel_init=_XAVIER, dtype=self.dtype,
                         name="value_proj")(input_flatten)
        value = value.reshape(B, S, M, D)

        # sampling locations stay f32: bf16's 8-bit mantissa quantizes pixel
        # coordinates by up to ~0.25px on the stride-8 level
        offsets = nn.Dense(
            M * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offset_bias_init(M, L, P),
            dtype=jnp.float32,
            name="sampling_offsets",
        )(query).reshape(B, Lq, M, L, P, 2)

        attn = nn.Dense(
            M * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="attention_weights",
        )(query).reshape(B, Lq, M, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Lq, M, L, P)

        # normalize offsets by each level's (W, H)
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], dtype=jnp.float32
        )  # [L, 2] as (W, H)
        locations = (
            reference_points[:, :, None, :, None, :].astype(jnp.float32)
            + offsets / normalizer[None, None, None, :, None, :]
        )
        # fwd-only eval runs the Pallas v2 kernel; training keeps the XLA
        # hat-matmul whose AD backward is currently faster end-to-end
        # (tools_dev/bench_msda.py: fwd+bwd 2.28 vs 2.47 ms/layer)
        out = ms_deform_attn(value, spatial_shapes, locations, attn,
                             impl="auto_train" if self.train else "auto")
        return nn.Dense(self.d_model, kernel_init=_XAVIER, dtype=self.dtype,
                        name="output_proj")(out)


class MSDeformAttnEncoderLayer(nn.Module):
    d_model: int = 128
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    train: bool = True

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes):
        attn = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, train=self.train, name="self_attn"
        )(src + pos, reference_points, src, spatial_shapes)
        # dtype pinned: flax norms default to promoting bf16 activations to
        # f32, which would double the residual stream's HBM traffic across
        # all 6 layers (stats are still computed in f32 internally)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn)
        y = nn.Dense(self.d_ffn, kernel_init=_XAVIER, dtype=self.dtype, name="linear1")(src)
        y = nn.Dense(self.d_model, kernel_init=_XAVIER, dtype=self.dtype,
                     name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + y)


def encoder_reference_points(spatial_shapes, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized pixel-center grid per level, replicated across levels
    (msdeformattn.py:141-153 with valid_ratios == 1)."""
    refs = []
    for (H, W) in spatial_shapes:
        ry = (jnp.arange(H, dtype=dtype) + 0.5) / H
        rx = (jnp.arange(W, dtype=dtype) + 0.5) / W
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = jnp.concatenate(refs, axis=0)                       # [S, 2]
    L = len(spatial_shapes)
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], L, 2))


class MSDeformAttnPixelDecoder(nn.Module):
    """Pixel decoder; consumes backbone features, emits mask features.

    Returns (mask_features [B,H/4,W/4,conv_dim], encoder res5 map,
    multi_scale_features [res5', res4', res3']).
    """

    conv_dim: int = 128
    # Accepted for config symmetry but UNUSED here: mask features leave this
    # module at conv_dim channels; the mask_dim projection lives in the
    # transformer decoder's mask head (unlike fpn_decoder.py, which projects)
    mask_dim: int = 16
    norm: str = "SyncBN"      # FPN lateral/output conv norm (config SEM_SEG_HEAD.NORM)
    transformer_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    d_ffn: int = 1024
    transformer_in_features: Sequence[str] = ("res3", "res4", "res5")
    fpn_in_features: Sequence[str] = ("res2",)
    train: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"  # layers.remat_policy: full | dots
    # As-published FPN quirk (msdeformattn.py:348): the reference swapped
    # the upstream Mask2Former operands — `out[-1] + interpolate(cur_fpn,
    # -> out[-1].size)` instead of `cur_fpn + interpolate(out[-1], ->
    # cur_fpn.size)` — so its "stride-4" mask features are actually the
    # res2 lateral DOWNSAMPLED onto the stride-8 grid.  Internally benign
    # (the dynamic head's stride constant cancels through the rel-coord
    # scaling, mask2former_transformer_decoder.py:654-668) but it halves
    # the mask-rendering resolution.  Default False = the upstream
    # Mask2Former formula (finer stride-4 masks); True replicates the
    # published behavior bit-for-bit for checkpoint/output parity.
    fpn_legacy_swap: bool = False

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        # The reference forces this whole region to fp32 (msdeformattn.py:314
        # @autocast(enabled=False)) because fp16 overflows; bf16 shares f32's
        # exponent range so the TPU policy keeps the encoder in the compute
        # dtype and pins only the sampling locations / softmax to f32.
        dtype = self.dtype
        # top-down order: res5, res4, res3
        tif = list(self.transformer_in_features)[::-1]
        srcs = []
        pos = []
        spatial_shapes = []
        for idx, name in enumerate(tif):
            x = features[name].astype(dtype)
            B, H, W, _ = x.shape
            y = nn.Conv(self.conv_dim, (1, 1), kernel_init=_XAVIER, dtype=dtype,
                        name=f"input_proj{idx}")(x)
            y = nn.GroupNorm(epsilon=1e-5, num_groups=32, dtype=dtype,
                             name=f"input_gn{idx}")(y)
            srcs.append(y.reshape(B, H * W, self.conv_dim))
            pe = position_embedding_sine(H, W, self.conv_dim // 2).astype(dtype)
            pos.append(jnp.broadcast_to(pe.reshape(1, H * W, self.conv_dim), (B, H * W, self.conv_dim)))
            spatial_shapes.append((H, W))

        spatial_shapes = tuple(spatial_shapes)  # hashable (remat static arg)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (len(tif), self.conv_dim)
        ).astype(dtype)
        # level_embed rides the POSITIONAL stream (reference
        # msdeformattn.py:74-76: lvl_pos_embed = pos_embed + level_embed,
        # src left clean) — it reaches only the offset/weight queries, not
        # the value projection or the residual stream.
        src_flat = jnp.concatenate(srcs, axis=1)
        pos_flat = jnp.concatenate(
            [p + level_embed[i][None, None, :] for i, p in enumerate(pos)],
            axis=1)
        refs = encoder_reference_points(spatial_shapes, jnp.float32)
        refs = jnp.broadcast_to(refs[None], (src_flat.shape[0],) + refs.shape)

        # remat: recompute each encoder layer in the backward pass instead of
        # storing its activations (HBM for FLOPs; spatial_shapes is static)
        layer_cls = (
            nn.remat(MSDeformAttnEncoderLayer, static_argnums=(4,),
                     policy=remat_policy(self.remat_policy))
            if self.remat else MSDeformAttnEncoderLayer
        )
        y = src_flat
        for i in range(self.transformer_layers):
            y = layer_cls(
                self.conv_dim, self.d_ffn, len(tif), self.n_heads, self.n_points,
                dtype=dtype, train=self.train, name=f"encoder_layer{i}",
            )(y, pos_flat, refs, spatial_shapes)

        # split back into maps
        out = []
        start = 0
        for (H, W) in spatial_shapes:
            B = y.shape[0]
            out.append(y[:, start : start + H * W].reshape(B, H, W, self.conv_dim))
            start += H * W

        # FPN fusion for res2 -> stride-4 mask features (or the published
        # stride-8 variant under fpn_legacy_swap; see the field docstring)
        for idx, name in enumerate(list(self.fpn_in_features)[::-1]):
            x = features[name].astype(dtype)
            lateral = ConvNorm(
                self.conv_dim, (1, 1), norm=self.norm, use_bias=(self.norm == ""),
                train=self.train, axis_name=self.axis_name, dtype=dtype,
                name=f"adapter{idx}",
            )(x)
            if self.fpn_legacy_swap:
                down = resize_bilinear(
                    jnp.moveaxis(lateral, -1, 1), out[-1].shape[1:3]
                )
                fused = out[-1] + jnp.moveaxis(down, 1, -1)
            else:
                up = resize_bilinear(
                    jnp.moveaxis(out[-1], -1, 1), x.shape[1:3]
                )
                fused = lateral + jnp.moveaxis(up, 1, -1)
            fused = ConvNorm(
                self.conv_dim, (3, 3), norm=self.norm, activation=nn.relu,
                use_bias=(self.norm == ""), train=self.train, axis_name=self.axis_name,
                dtype=dtype, name=f"layer{idx}",
            )(fused)
            out.append(fused)

        multi_scale_features = out[:3]
        return out[-1], out[0], multi_scale_features
