"""Lightweight residual 3D U-Net (reference arch/resunet_limx.py
``unet_residual_3d``:37-174, the [Lee2017] superhuman-SNEMI3D design).

Anisotropic throughout: (1, k, k) convs, (1, 2, 2) strided downsampling
("conv3d downsample", resunet_limx.py:80-83), fixed-weight bilinear
transposed-conv upsampling (``BilinearUp``:11-34 — equivalent to a 2x
bilinear resize with align_corners=False, which is what we use), residual
blocks with full (3, 3, 3) kernels (block/basic.py residual_block_3d:72-97),
sigmoid output activation.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvNormAct, get_legacy_activation, linear_resize


class _ResidualBlock3D(nn.Module):
    """residual_block_3d (basic.py:72-97): isotropic 3x3x3 convs; the skip
    is projected only when ``projection`` (else identity — requires equal
    channels, as in the reference usage)."""

    planes: int
    projection: bool = False
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shared = dict(spatial_rank=3, pad_mode=self.pad_mode,
                      norm_mode=self.norm_mode, train=self.train,
                      dtype=self.dtype)
        y = ConvNormAct(self.planes, 3, act_mode=self.act_mode,
                        name="conv1", **shared)(x)
        y = ConvNormAct(self.planes, 3, act_mode="none", name="conv2", **shared)(y)
        if self.projection:
            y = y + ConvNormAct(self.planes, 1, act_mode="none",
                                name="projector", **shared)(x)
        else:
            y = y + x
        return get_legacy_activation(self.act_mode)(y)


class UNetResidual3D(nn.Module):
    in_channel: int = 1
    out_channel: int = 3
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    pad_mode: str = "replicate"
    norm_mode: str = "bn"
    act_mode: str = "elu"
    do_embedding: bool = True
    head_depth: int = 1
    output_act: str = "sigmoid"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = list(self.filters)
        depth = len(f) - 2
        shared = dict(spatial_rank=3, pad_mode=self.pad_mode,
                      act_mode=self.act_mode, norm_mode=self.norm_mode,
                      train=self.train, dtype=self.dtype)
        rshared = dict(pad_mode=self.pad_mode, act_mode=self.act_mode,
                       norm_mode=self.norm_mode, train=self.train,
                       dtype=self.dtype)

        def down_sample(h, ch, name):
            return ConvNormAct(ch, (1, 3, 3), strides=(1, 2, 2),
                               name=name, **shared)(h)

        def up_sample(h, ch, name):
            h = ConvNormAct(ch, 1, name=name, **shared)(h)
            tgt = (h.shape[1], h.shape[2] * 2, h.shape[3] * 2)
            return linear_resize(h, tgt, align_corners=False)

        z = None
        if self.do_embedding:
            z = ConvNormAct(f[0], (1, 5, 5), name="downE_conv1", **shared)(x)
            z = ConvNormAct(f[0], (1, 3, 3), name="downE_conv2", **shared)(z)
            z = _ResidualBlock3D(f[0], name="downE_block", **rshared)(z)
            x = down_sample(z, f[0], "downS0")
        else:
            f[0] = self.in_channel

        skips = []
        for i in range(depth):
            x = ConvNormAct(f[i + 1], (1, 3, 3), name=f"downC{i}_conv", **shared)(x)
            x = _ResidualBlock3D(f[i + 1], name=f"downC{i}_block", **rshared)(x)
            skips.append(x)
            x = down_sample(x, f[i + 1], f"downS{i + 1}")

        x = ConvNormAct(f[-1], (1, 3, 3), name="center_conv", **shared)(x)
        x = _ResidualBlock3D(f[-1], projection=True, name="center_block",
                             **rshared)(x)

        if self.do_embedding:
            z = ConvNormAct(f[0], (1, 3, 3), name="middle0", **shared)(z)

        for i in range(depth - 1, -1, -1):
            x = skips[i] + up_sample(x, f[i + 1], f"upS{i + 1}")
            x = ConvNormAct(f[i + 1], (1, 3, 3), name=f"upC{i}_conv", **shared)(x)
            x = _ResidualBlock3D(f[i + 1], name=f"upC{i}_block", **rshared)(x)

        if self.do_embedding:
            x = z + up_sample(x, f[0], "upS0")
            x = ConvNormAct(f[0], (1, 3, 3), name="upE_conv1", **shared)(x)
            x = _ResidualBlock3D(f[0], name="upE_block", **rshared)(x)
            x = ConvNormAct(self.out_channel, (1, 5, 5), act_mode="none",
                            spatial_rank=3, pad_mode=self.pad_mode,
                            norm_mode=self.norm_mode, train=self.train,
                            dtype=self.dtype, name="upE_out")(x)
        else:
            for d in range(self.head_depth - 1):
                x = _ResidualBlock3D(f[1], name=f"head_block{d}", **rshared)(x)
            x = ConvNormAct(self.out_channel, 1, act_mode="none",
                            spatial_rank=3, norm_mode=self.norm_mode,
                            train=self.train, dtype=self.dtype, name="head_out")(x)

        return get_legacy_activation(self.output_act)(x.astype(jnp.float32))
