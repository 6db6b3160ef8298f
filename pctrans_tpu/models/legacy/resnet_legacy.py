"""Legacy ResNet backbones (reference connectomics/model/backbone/resnet.py).

* :class:`ResNet3D` (:28-101): five stages of residual blocks for
  (an)isotropic volumes; the FPN3D backbone.  Returns the per-stage feature
  dict (the reference wraps it in ``IntermediateLayerGetter`` with keys
  ``feat1..feat5``, backbone/build.py:24-32).
* :class:`ResNet2D` (:245+): torchvision-style bottleneck ResNet with
  ``replace_stride_with_dilation`` — the DeepLabV3 backbone.  Returns a dict
  with ``out`` (layer4), optional ``aux`` (layer3) and ``low_level_feat``
  (layer1) keys per the DeepLab contract (arch/deeplab.py:49-54).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BasicBlock, BasicBlockSE, ConvNormAct, get_legacy_activation, get_legacy_norm, pad_spatial

_BLOCKS = {"residual": BasicBlock, "residual_se": BasicBlockSE}


class ResNet3D(nn.Module):
    """5-stage 3D residual backbone; input [B, D, H, W, C]."""

    block_type: str = "residual"
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    blocks: Sequence[int] = (2, 2, 2, 2)
    isotropy: Sequence[bool] = (False, False, False, True, True)
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    feature_keys: Sequence[str] = ("feat1", "feat2", "feat3", "feat4", "feat5")
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        block_cls = _BLOCKS[self.block_type]
        shared = dict(spatial_rank=3, pad_mode=self.pad_mode,
                      act_mode=self.act_mode, norm_mode=self.norm_mode,
                      train=self.train, dtype=self.dtype)
        k0 = (5, 5, 5) if self.isotropy[0] else (1, 5, 5)
        x = ConvNormAct(self.filters[0], k0, name="layer0", **shared)(x)
        feats = {self.feature_keys[0]: x}
        for s in range(1, len(self.filters)):
            iso = self.isotropy[s]
            stride = 2 if iso else (1, 2, 2)
            x = block_cls(self.filters[s], strides=stride, isotropic=iso,
                          name=f"layer{s}_block0", **shared)(x)
            for b in range(1, self.blocks[s - 1]):
                x = block_cls(self.filters[s], isotropic=iso,
                              name=f"layer{s}_block{b}", **shared)(x)
            feats[self.feature_keys[s]] = x
        return feats


class Bottleneck2D(nn.Module):
    """torchvision Bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""

    planes: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    norm_mode: str = "bn"
    act_mode: str = "relu"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_legacy_activation(self.act_mode)
        out_ch = self.planes * 4

        def conv(h, ch, k, stride, dil, name):
            h = pad_spatial(h, (k, k), (dil, dil), "zeros")
            h = nn.Conv(ch, (k, k), strides=(stride, stride),
                        kernel_dilation=(dil, dil), padding="VALID",
                        use_bias=False, dtype=self.dtype, name=name)(h)
            norm = get_legacy_norm(self.norm_mode, ch, self.train,
                                   spatial_rank=2)
            return norm(h) if norm is not None else h

        y = act(conv(x, self.planes, 1, 1, 1, "conv1"))
        y = act(conv(y, self.planes, 3, self.strides, self.dilation, "conv2"))
        y = conv(y, out_ch, 1, 1, 1, "conv3")
        if self.downsample or x.shape[-1] != out_ch or self.strides != 1:
            x = conv(x, out_ch, 1, self.strides, 1, "downsample")
        return act(y + x)


class ResNet2D(nn.Module):
    """torchvision-style bottleneck ResNet (default resnet50 layout) with
    ``replace_stride_with_dilation`` (backbone/resnet.py:245+); returns
    the DeepLab feature dict."""

    layers: Sequence[int] = (3, 4, 6, 3)
    in_planes: int = 64
    replace_stride_with_dilation: Sequence[bool] = (False, True, True)
    norm_mode: str = "bn"
    act_mode: str = "relu"
    aux_out: bool = False
    low_level_feat: bool = False
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        act = get_legacy_activation(self.act_mode)
        x = pad_spatial(x, (7, 7), (1, 1), "zeros")
        x = nn.Conv(self.in_planes, (7, 7), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        norm = get_legacy_norm(self.norm_mode, self.in_planes, self.train,
                               spatial_rank=2)
        if norm is not None:
            x = norm(x)
        x = act(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        feats = {}
        dilation = 1
        planes = (64, 128, 256, 512)
        for li, (p, n) in enumerate(zip(planes, self.layers)):
            stride = 1 if li == 0 else 2
            if li > 0 and self.replace_stride_with_dilation[li - 1]:
                dilation *= stride
                stride = 1
            x = Bottleneck2D(p, strides=stride, dilation=dilation,
                             downsample=True, norm_mode=self.norm_mode,
                             act_mode=self.act_mode, train=self.train,
                             dtype=self.dtype, name=f"layer{li + 1}_block0")(x)
            for b in range(1, n):
                x = Bottleneck2D(p, dilation=dilation,
                                 norm_mode=self.norm_mode,
                                 act_mode=self.act_mode, train=self.train,
                                 dtype=self.dtype,
                                 name=f"layer{li + 1}_block{b}")(x)
            if li == 0 and self.low_level_feat:
                feats["low_level_feat"] = x
            if li == 2 and self.aux_out:
                feats["aux"] = x
        feats["out"] = x
        return feats
