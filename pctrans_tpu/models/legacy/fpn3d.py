"""3D feature pyramid network (reference connectomics/model/arch/fpn.py:14-141).

backbone (resnet / repvgg) -> per-stage 1x1 lateral convs to ``filters[0]``
channels -> top-down: trilinear-upsample (align_corners=True), smooth
(3x3-style conv at the stage's isotropy), add -> final smooth + io conv.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvNormAct, linear_resize
from .botnet import BotNet3D
from .efficientnet import EfficientNet3D
from .repvgg import RepVGG3D
from .resnet_legacy import ResNet3D


class FPN3D(nn.Module):
    backbone_type: str = "resnet"
    block_type: str = "residual"
    in_channel: int = 1
    out_channel: int = 3
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    blocks: Sequence[int] = (2, 2, 2, 2)
    is_isotropic: bool = False
    isotropy: Sequence[bool] = (False, False, False, True, True)
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    deploy: bool = False
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        isotropy = ([True] * len(self.filters) if self.is_isotropic
                    else tuple(self.isotropy))
        keys = tuple(f"feat{i + 1}" for i in range(len(self.filters)))
        if self.backbone_type == "resnet":
            feats = ResNet3D(
                block_type=self.block_type, filters=self.filters,
                blocks=self.blocks, isotropy=isotropy, pad_mode=self.pad_mode,
                act_mode=self.act_mode, norm_mode=self.norm_mode,
                feature_keys=keys, train=self.train, dtype=self.dtype,
                name="backbone")(x)
        elif self.backbone_type == "repvgg":
            feats = RepVGG3D(
                filters=self.filters, blocks=self.blocks, isotropy=isotropy,
                pad_mode=self.pad_mode, act_mode=self.act_mode,
                deploy=self.deploy, feature_keys=keys, train=self.train,
                dtype=self.dtype, name="backbone")(x)
        elif self.backbone_type == "botnet":
            feats = BotNet3D(
                block_type=self.block_type, filters=self.filters,
                blocks=self.blocks, isotropy=isotropy,
                pad_mode=self.pad_mode, act_mode=self.act_mode,
                norm_mode=self.norm_mode, feature_keys=keys,
                train=self.train, dtype=self.dtype, name="backbone")(x)
        elif self.backbone_type == "efficientnet":
            feats = EfficientNet3D(
                filters=self.filters, blocks=tuple(self.blocks) + (2,) * max(
                    0, len(self.filters) - len(self.blocks)),
                isotropy=isotropy, pad_mode=self.pad_mode,
                act_mode=self.act_mode, norm_mode=self.norm_mode,
                feature_keys=keys, train=self.train, dtype=self.dtype,
                name="backbone")(x)
        else:
            raise ValueError(f"Unsupported FPN3D backbone: {self.backbone_type}")

        shared = dict(spatial_rank=3, pad_mode=self.pad_mode,
                      act_mode=self.act_mode, norm_mode=self.norm_mode,
                      train=self.train, dtype=self.dtype)
        depth = len(self.filters)
        lat = [
            ConvNormAct(self.filters[0], 1, name=f"lat{i}", **shared)(feats[keys[i]])
            for i in range(depth)
        ]

        def smooth(i, h):
            k = (3, 3, 3) if isotropy[i] else (1, 3, 3)
            return ConvNormAct(self.filters[0], k, name=f"smooth{i}", **shared)(h)

        out = lat[depth - 1]
        for j in range(depth - 1):
            i = depth - 1 - j
            up = linear_resize(out, lat[i - 1].shape[1:-1], align_corners=True)
            out = smooth(i, up) + lat[i - 1]
        out = smooth(0, out)

        k_io = (5, 5, 5) if isotropy[0] else (1, 5, 5)
        return ConvNormAct(
            self.out_channel, k_io, spatial_rank=3, use_bias=True,
            pad_mode=self.pad_mode, norm_mode="none", act_mode="none",
            train=self.train, dtype=self.dtype, name="conv_out",
        )(out).astype(jnp.float32)
