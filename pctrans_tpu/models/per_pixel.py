"""Per-pixel semantic segmentation baseline heads.

Equivalents of the reference ``PerPixelBaselineHead`` and
``PerPixelBaselinePlusHead`` (maskformer_block/meta_arch/
per_pixel_baseline.py:18-243), registered under ``MODEL.SEM_SEG_HEAD.NAME``
but unused by the trained PCTrans configs.

* ``PerPixelBaselineHead``: pixel decoder -> 1x1 predictor conv over
  ``mask_dim`` -> per-pixel class logits at stride 4.
* ``PerPixelBaselinePlusHead``: adds a DETR ``StandardTransformerDecoder``
  (mask_classification=False) whose query-mask logits replace the plain
  predictor; deep supervision returns the earlier layers' maps.

Both return logits at the mask-feature resolution (stride 4); upsampling to
input resolution and the cross-entropy loss live with the caller, as in the
reference (per_pixel_baseline.py:104-123).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from .detr_decoder import StandardTransformerDecoder
from .fpn_decoder import BasePixelDecoder, TransformerEncoderPixelDecoder

_MSRA = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _build_pixel_decoder(name, conv_dim, mask_dim, norm, nheads, d_ffn,
                         enc_layers, train, axis_name, dtype):
    if name == "BasePixelDecoder":
        return BasePixelDecoder(
            conv_dim=conv_dim, mask_dim=mask_dim, norm=norm, train=train,
            axis_name=axis_name, dtype=dtype, name="pixel_decoder")
    if name == "TransformerEncoderPixelDecoder":
        return TransformerEncoderPixelDecoder(
            conv_dim=conv_dim, mask_dim=mask_dim, norm=norm, nheads=nheads,
            d_ffn=d_ffn, transformer_enc_layers=enc_layers, train=train,
            axis_name=axis_name, dtype=dtype, name="pixel_decoder")
    raise ValueError(f"Unsupported pixel decoder for per-pixel head: {name}")


class PerPixelBaselineHead(nn.Module):
    """pixel decoder + 1x1 class predictor (per_pixel_baseline.py:18-123)."""

    num_classes: int = 1
    conv_dim: int = 128
    mask_dim: int = 16
    norm: str = "SyncBN"
    pixel_decoder_name: str = "BasePixelDecoder"
    nheads: int = 8
    d_ffn: int = 1024
    enc_layers: int = 6
    train: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        mask_features, _, _ = _build_pixel_decoder(
            self.pixel_decoder_name, self.conv_dim, self.mask_dim, self.norm,
            self.nheads, self.d_ffn, self.enc_layers, self.train,
            self.axis_name, self.dtype,
        )(features)
        logits = nn.Conv(self.num_classes, (1, 1), kernel_init=_MSRA,
                         dtype=self.dtype, name="predictor")(mask_features)
        # NHWC -> NCHW logits convention of the reference eval path
        return jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)


class PerPixelBaselinePlusHead(nn.Module):
    """pixel decoder + DETR transformer predictor
    (per_pixel_baseline.py:127-243).  Returns a dict: ``pred_masks``
    [B, Q, Hm, Wm] (Q = num_classes queries) and ``aux_masks`` when
    ``deep_supervision``."""

    num_classes: int = 1
    conv_dim: int = 128
    mask_dim: int = 16
    norm: str = "SyncBN"
    pixel_decoder_name: str = "TransformerEncoderPixelDecoder"
    transformer_in_feature: str = "transformer_encoder"
    hidden_dim: int = 128
    nheads: int = 8
    d_ffn: int = 1024
    enc_layers: int = 6
    dec_layers: int = 10
    deep_supervision: bool = True
    train: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        mask_features, encoder_features, _ = _build_pixel_decoder(
            self.pixel_decoder_name, self.conv_dim, self.mask_dim, self.norm,
            self.nheads, self.d_ffn, self.enc_layers, self.train,
            self.axis_name, self.dtype,
        )(features)
        if self.transformer_in_feature == "transformer_encoder":
            if encoder_features is None:
                raise ValueError(
                    "transformer_in_feature='transformer_encoder' requires "
                    "the TransformerEncoderPixelDecoder"
                )  # per_pixel_baseline.py:233-236
            x = encoder_features
        else:
            x = features[self.transformer_in_feature]
        # num_queries = num_classes: each query predicts one class map
        # (StandardTransformerDecoder(cfg, ..., mask_classification=False))
        return StandardTransformerDecoder(
            hidden_dim=self.hidden_dim,
            num_queries=self.num_classes,
            nheads=self.nheads,
            dim_feedforward=self.d_ffn,
            enc_layers=0,
            dec_layers=self.dec_layers,
            mask_dim=self.mask_dim,
            mask_classification=False,
            deep_supervision=self.deep_supervision,
            train=self.train,
            dtype=self.dtype,
            name="predictor",
        )(x, mask_features)
