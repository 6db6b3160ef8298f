"""Alternative pixel decoders: plain FPN and FPN + transformer encoder.

Equivalents of the reference ``BasePixelDecoder`` and
``TransformerEncoderPixelDecoder`` (maskformer_block/pixel_decoder/
fpn.py:38-159, 205-312), registered in the reference under
``MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME`` but unused by the trained PCTrans
configs.  Both return the same triple as ``MSDeformAttnPixelDecoder``:
``(mask_features, transformer_encoder_features, multi_scale_features[3])``
with multi-scale features in top-down (low-res first) order.

Flax / NHWC; nearest upsampling for the FPN sum (fpn.py:149), bilinear is
never used here.  Dropout is omitted (the reference config default
``MASK_FORMER.DROPOUT = 0.0``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_nearest_torch
from .layers import ConvNorm, position_embedding_sine


def _nearest_up_nhwc(x, size):
    """Nearest upsample of NHWC maps with torch's floor index rule
    (F.interpolate(mode='nearest'), fpn.py:149)."""
    y = jnp.transpose(x, (0, 3, 1, 2))
    y = resize_nearest_torch(y, size)
    return jnp.transpose(y, (0, 2, 3, 1))

_XAVIER = nn.initializers.xavier_uniform()


class TransformerEncoderLayerPostNorm(nn.Module):
    """One DETR transformer encoder layer, post-norm variant
    (maskformer_block/transformer_decoder/transformer.py TransformerEncoderLayer
    with ``normalize_before=False``): q = k = src + pos."""

    d_model: int
    nheads: int
    d_ffn: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        q = k = src + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nheads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            kernel_init=_XAVIER,
            dtype=self.dtype,
            name="self_attn",
        )(q, k, src)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + attn)
        y = nn.Dense(self.d_ffn, kernel_init=_XAVIER, dtype=self.dtype,
                     name="linear1")(src)
        y = nn.Dense(self.d_model, kernel_init=_XAVIER, dtype=self.dtype,
                     name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + y)


class BasePixelDecoder(nn.Module):
    """Plain FPN pixel decoder (fpn.py:38-159).

    Top-down over res5..res2: the lowest-resolution level goes through a
    3x3 output conv directly; every other level is a 1x1 lateral conv plus
    the nearest-upsampled running map, then a 3x3 output conv.  The first
    three levels (res5', res4', res3') are the multi-scale features; the
    final (res2-level) map feeds a 3x3 ``mask_features`` conv.
    """

    conv_dim: int = 128
    mask_dim: int = 16
    norm: str = "SyncBN"
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    train: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        y = None
        multi_scale = []
        # top-down: res5 first (fpn.py:140)
        for idx, name in enumerate(self.in_features[::-1]):
            x = features[name].astype(self.dtype)
            if idx == 0:
                y = ConvNorm(
                    self.conv_dim, (3, 3), norm=self.norm, activation=nn.relu,
                    train=self.train, axis_name=self.axis_name,
                    dtype=self.dtype, name=f"layer_{len(self.in_features)}",
                )(x)
            else:
                lat = ConvNorm(
                    self.conv_dim, (1, 1), norm=self.norm,
                    train=self.train, axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"adapter_{len(self.in_features) - idx}",
                )(x)
                y = lat + _nearest_up_nhwc(y, lat.shape[1:3]).astype(self.dtype)
                y = ConvNorm(
                    self.conv_dim, (3, 3), norm=self.norm, activation=nn.relu,
                    train=self.train, axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"layer_{len(self.in_features) - idx}",
                )(y)
            if len(multi_scale) < 3:  # maskformer_num_feature_levels (fpn.py:123)
                multi_scale.append(y)
        mask_features = ConvNorm(
            self.mask_dim, (3, 3), norm="", train=self.train,
            dtype=self.dtype, name="mask_features",
        )(y)
        return mask_features, None, multi_scale


class TransformerEncoderPixelDecoder(nn.Module):
    """FPN pixel decoder with a transformer encoder on res5 (fpn.py:205-312).

    Identical to :class:`BasePixelDecoder` except the lowest-resolution level
    is first projected (1x1), run through ``transformer_enc_layers`` standard
    DETR encoder layers with sine position embeddings, and the encoder output
    is also returned as ``transformer_encoder_features`` (the input to a
    DETR-style ``StandardTransformerDecoder``).
    """

    conv_dim: int = 128
    mask_dim: int = 16
    norm: str = "SyncBN"
    nheads: int = 8
    d_ffn: int = 1024
    transformer_enc_layers: int = 6
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    train: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]):
        y = None
        encoder_features = None
        multi_scale = []
        for idx, name in enumerate(self.in_features[::-1]):
            x = features[name].astype(self.dtype)
            if idx == 0:
                B, H, W, _ = x.shape
                t = nn.Conv(self.conv_dim, (1, 1), kernel_init=_XAVIER,
                            dtype=self.dtype, name="input_proj")(x)
                pos = position_embedding_sine(H, W, self.conv_dim // 2)
                pos = pos.reshape(1, H * W, self.conv_dim).astype(self.dtype)
                t = t.reshape(B, H * W, self.conv_dim)
                for li in range(self.transformer_enc_layers):
                    t = TransformerEncoderLayerPostNorm(
                        self.conv_dim, self.nheads, self.d_ffn,
                        dtype=self.dtype, name=f"encoder_layer{li}",
                    )(t, pos)
                encoder_features = t.reshape(B, H, W, self.conv_dim)
                y = ConvNorm(
                    self.conv_dim, (3, 3), norm=self.norm, activation=nn.relu,
                    train=self.train, axis_name=self.axis_name,
                    dtype=self.dtype, name=f"layer_{len(self.in_features)}",
                )(encoder_features)
            else:
                lat = ConvNorm(
                    self.conv_dim, (1, 1), norm=self.norm,
                    train=self.train, axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"adapter_{len(self.in_features) - idx}",
                )(x)
                y = lat + _nearest_up_nhwc(y, lat.shape[1:3]).astype(self.dtype)
                y = ConvNorm(
                    self.conv_dim, (3, 3), norm=self.norm, activation=nn.relu,
                    train=self.train, axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"layer_{len(self.in_features) - idx}",
                )(y)
            if len(multi_scale) < 3:
                multi_scale.append(y)
        mask_features = ConvNorm(
            self.mask_dim, (3, 3), norm="", train=self.train,
            dtype=self.dtype, name="mask_features",
        )(y)
        return mask_features, encoder_features, multi_scale
