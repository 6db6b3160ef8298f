"""2D DeepLabV3 (reference connectomics/model/arch/deeplab.py:17-302).

Dilated bottleneck ResNet backbone (``replace_stride_with_dilation =
[False, True, True]``, deeplab.py:44-47) + one of three heads:

* deeplabv3a — ASPP -> 3x3 conv -> 1x1 classifier (DeepLabHeadA:101-118)
* deeplabv3b — ASPP -> conv -> ~2x upsample (odd sizes -> 2H-1) -> conv
  (DeepLabHeadB:121-161)
* deeplabv3c — ASPP upsampled to the layer1 feature, concatenated with a
  projected low-level feature, then classified (DeepLabHeadC:164-196)

plus an optional FCN auxiliary classifier on layer3 (:199+).  Outputs are
bilinearly upsampled (align_corners=True) to the input resolution and
returned as ``{"out": ..., "aux"?: ...}``.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvNormAct, get_legacy_activation, get_legacy_norm, linear_resize
from .resnet_legacy import ResNet2D


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (deeplab.py:242-277)."""

    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shared = dict(spatial_rank=2, pad_mode=self.pad_mode,
                      act_mode=self.act_mode, norm_mode=self.norm_mode,
                      train=self.train, dtype=self.dtype)
        branches = [ConvNormAct(self.out_channels, 1, name="conv1x1", **shared)(x)]
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                ConvNormAct(self.out_channels, 3, dilation=rate,
                            name=f"atrous{i}", **shared)(x))
        # image pooling branch: global average -> 1x1 -> broadcast back
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = ConvNormAct(self.out_channels, 1, name="pool_conv", **shared)(pooled)
        branches.append(jnp.broadcast_to(
            pooled, x.shape[:3] + (self.out_channels,)))
        y = jnp.concatenate(branches, axis=-1)
        return ConvNormAct(self.out_channels, 1, name="project", **shared)(y)


class DeepLabV3(nn.Module):
    """Dispatch by ``name`` like the reference ``head_map``
    (deeplab.py:63-69); input [B, H, W, C], output dict of [B, C_out, H, W]
    logits (NCHW to match the reference eval contract)."""

    name_variant: str = "deeplabv3a"
    out_channel: int = 1
    aux_out: bool = False
    backbone_layers: Sequence[int] = (3, 4, 6, 3)  # resnet50
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        assert self.name_variant in ("deeplabv3a", "deeplabv3b", "deeplabv3c")
        in_hw = x.shape[1:3]
        feats = ResNet2D(
            layers=self.backbone_layers,
            replace_stride_with_dilation=(False, True, True),
            norm_mode=self.norm_mode, act_mode=self.act_mode,
            aux_out=self.aux_out,
            low_level_feat=self.name_variant == "deeplabv3c",
            train=self.train, dtype=self.dtype, name="backbone")(x)

        shared = dict(spatial_rank=2, pad_mode=self.pad_mode,
                      act_mode=self.act_mode, norm_mode=self.norm_mode,
                      train=self.train, dtype=self.dtype)
        aspp = ASPP(256, pad_mode=self.pad_mode, act_mode=self.act_mode,
                    norm_mode=self.norm_mode, train=self.train,
                    dtype=self.dtype, name="aspp")
        y = aspp(feats["out"])

        if self.name_variant == "deeplabv3a":
            y = ConvNormAct(256, 3, name="head_conv", **shared)(y)
            y = nn.Conv(self.out_channel, (1, 1), dtype=self.dtype,
                        name="classifier")(y)
        elif self.name_variant == "deeplabv3b":
            y = ConvNormAct(128, 3, name="head_conv1", **shared)(y)
            H, W = y.shape[1:3]
            up = (2 * H - 1 if H % 2 == 1 else 2 * H,
                  2 * W - 1 if W % 2 == 1 else 2 * W)  # deeplab.py:157-161
            y = linear_resize(y, up, align_corners=True)
            y = ConvNormAct(128, 3, name="head_conv2", **shared)(y)
            y = nn.Conv(self.out_channel, (3, 3), padding="SAME",
                        dtype=self.dtype, name="classifier")(y)
        else:  # deeplabv3c
            low = feats["low_level_feat"]
            y = linear_resize(y, low.shape[1:3], align_corners=True)
            low = ConvNormAct(32, 1, name="low_proj", **shared)(low)
            y = jnp.concatenate([y, low], axis=-1)
            y = ConvNormAct(256, 3, name="head_conv", **shared)(y)
            y = nn.Conv(self.out_channel, (1, 1), dtype=self.dtype,
                        name="classifier")(y)

        # NHWC out, like every other legacy model — the trainer applies the
        # single channels-first transpose (an internal NCHW transpose here
        # got transposed AGAIN by the trainer, yielding [B, W, C, H])
        out = {"out": linear_resize(y, in_hw,
                                    align_corners=True).astype(jnp.float32)}

        if self.aux_out:
            a = feats["aux"]
            inter = a.shape[-1] // 4
            a = ConvNormAct(inter, 3, name="aux_conv", **shared)(a)
            a = nn.Conv(self.out_channel, (1, 1), dtype=self.dtype,
                        name="aux_classifier")(a)
            out["aux"] = linear_resize(a, in_hw,
                                       align_corners=True).astype(jnp.float32)
        return out
