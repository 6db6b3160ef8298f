"""Shared layers: norms, conv blocks, MLPs, sine position embeddings.

Equivalents of detectron2's ``Conv2d``/``get_norm`` and the reference's
``PositionEmbeddingSine`` (maskformer_block/transformer_decoder/
position_encoding.py:12-64) and ``MLP``
(mask2former_transformer_decoder.py:249-261).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def remat_policy(name: str):
    """Map a TPU_RECIPE.REMAT_POLICY string to a jax.checkpoint policy.

    * "full": recompute everything in the backward pass (policy None) —
      minimum HBM, maximum recompute; the safe default that fits the 448²
      batch-2 recipe in 16 GB.
    * "dots": ``jax.checkpoint_policies.dots_saveable`` — matmul/conv
      outputs are stored, only elementwise chains (LayerNorm, softmax,
      residuals, bias/activation epilogues) are recomputed.  Costs HBM
      between "full" and no-remat; see BASELINE.md's train breakdown for
      the measured trade.
    """
    if name in (None, "", "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_saveable
    raise ValueError(f"Unknown REMAT_POLICY: {name!r} (expected full|dots)")


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine parameters frozen.

    detectron2 ResNets use FrozenBN everywhere when fine-tuning from ImageNet
    (the reference backbone config, configs/CVPPP/CVPPP-PCTrans-Base.yaml:
    14-27).  Parameters live in the ``frozen`` collection so the optimizer
    never sees them; with converted R-50 weights they hold the pretrained
    statistics, otherwise they are the identity.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.variable("frozen", "scale", jnp.ones, (self.features,))
        bias = self.variable("frozen", "bias", jnp.zeros, (self.features,))
        mean = self.variable("frozen", "mean", jnp.zeros, (self.features,))
        var = self.variable("frozen", "var", jnp.ones, (self.features,))
        # fold in f32, apply in the activation dtype (a f32 multiplier would
        # silently promote a bf16 backbone back to f32)
        w = scale.value * jax.lax.rsqrt(var.value + self.eps)
        b = bias.value - mean.value * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)


def get_norm(name: str, features: int, train: bool = True, axis_name: Optional[str] = None):
    """Norm factory mirroring detectron2 ``get_norm``.

    ``SyncBN``/``BN`` become flax BatchNorm; when an ``axis_name`` is supplied
    batch statistics are averaged across that mesh axis, which is the TPU
    equivalent of ``nn.SyncBatchNorm`` (reference: model/build.py:80-81).
    """
    if not name:
        return None
    if name in ("BN", "SyncBN"):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=axis_name if (train and name == "SyncBN") else None,
        )
    if name == "GN":
        return nn.GroupNorm(epsilon=1e-5, num_groups=32)
    if name == "FrozenBN":
        return FrozenBatchNorm(features)
    if name == "LN":
        return nn.LayerNorm(epsilon=1e-5)
    raise ValueError(f"Unknown norm: {name}")


class ConvNorm(nn.Module):
    """conv + optional norm + optional activation (detectron2 Conv2d style)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    norm: str = ""
    activation: Optional[Callable] = None
    use_bias: Optional[bool] = None
    train: bool = True
    axis_name: Optional[str] = None
    kernel_init: Callable = nn.initializers.xavier_uniform()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_bias = self.use_bias if self.use_bias is not None else (self.norm == "")
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding="SAME",
            use_bias=use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)
        norm = get_norm(self.norm, self.features, self.train, self.axis_name)
        if norm is not None:
            x = norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class MLP(nn.Module):
    """Simple ReLU MLP (last layer linear)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    kernel_init: Callable = nn.initializers.xavier_uniform()
    bias_init: Callable = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            dim = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(dim, kernel_init=self.kernel_init, bias_init=self.bias_init,
                         dtype=self.dtype)(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def position_embedding_sine(
    h: int,
    w: int,
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """2D sine position embedding, DETR-style with normalize=True.

    Returns [H, W, 2*num_pos_feats] laid out as (y-features, x-features),
    matching the reference PositionEmbeddingSine (position_encoding.py:29-52).
    """
    scale = 2 * math.pi
    y_embed = jnp.arange(1, h + 1, dtype=dtype)[:, None] * jnp.ones((1, w), dtype)
    x_embed = jnp.arange(1, w + 1, dtype=dtype)[None, :] * jnp.ones((h, 1), dtype)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (h + eps) * scale
        x_embed = x_embed / (w + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=dtype)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def gen_sineembed_for_position(
    pos: jnp.ndarray, temperature: float = 20.0, dim: int = 128
) -> jnp.ndarray:
    """Sine embedding of normalized reference points.

    ``pos``: [..., 2*points] in [0, 1]; returns [..., 2*dim*points] laid out
    as (y-embed, x-embed) per point with ``dim`` dims each, matching the
    reference ``gen_sineembed_for_position``
    (mask2former_transformer_decoder.py:21-39, which hardcodes dim=128 — its
    hidden size; here it tracks hidden_dim so other widths work).
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(dim, dtype=pos.dtype)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / dim)
    outs = []
    for i in range(pos.shape[-1] // 2):
        x_embed = pos[..., 2 * i] * scale
        y_embed = pos[..., 2 * i + 1] * scale
        pos_x = x_embed[..., None] / dim_t
        pos_y = y_embed[..., None] / dim_t
        pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(*pos_x.shape[:-1], -1)
        pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(*pos_y.shape[:-1], -1)
        outs.append(pos_y)
        outs.append(pos_x)
    return jnp.concatenate(outs, axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)
