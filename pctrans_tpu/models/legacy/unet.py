"""Legacy residual U-Nets (reference connectomics/model/arch/unet.py).

One dimension-generic implementation covers ``UNet3D`` (:14-183), ``UNet2D``
(:226-343), ``UNetPlus3D`` (:185-223) and ``UNetPlus2D`` (:345-379):

* encoder: conv_in (5x5-style io kernel) then ``depth`` stages of
  [pool/stride-down, conv-norm-act, residual block];
* decoder: per stage a conv-norm-act on the coarse map, linear upsample
  (align_corners=True when downsampling by stride, False with pooling —
  unet.py:143-153) added to the skip, then a residual block;
* conv_out: io-kernel conv with bias, no norm/act.
* ``UNetPlus*`` add a non-local block at the bottleneck and per-stage 1x1
  projections of the bottleneck feature that are upsample-added as a second
  global skip (unet.py:199-223).

3D anisotropy: ``isotropy[i]`` selects (3,3,3)/(1,3,3) kernels and
2/(1,2,2) downsampling per stage (unet.py:156-182).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    BasicBlock,
    BasicBlockPA,
    BasicBlockSE,
    ConvNormAct,
    NonLocalBlock,
    linear_resize,
)

_BLOCKS = {
    "residual": BasicBlock,
    "residual_pa": BasicBlockPA,
    "residual_se": BasicBlockSE,
}


class _UNetBase(nn.Module):
    spatial_rank: int = 3
    block_type: str = "residual"
    in_channel: int = 1
    out_channel: int = 3
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    is_isotropic: bool = False
    isotropy: Sequence[bool] = (False, False, False, True, True)
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    pooling: bool = False
    plus: bool = False            # UNetPlus: non-local bottleneck + feat skips
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    def _iso(self, i: int) -> bool:
        if self.spatial_rank == 2:
            return True
        if self.is_isotropic:
            return True
        return bool(self.isotropy[i])

    def _kernel(self, iso: bool, io: bool = False):
        if self.spatial_rank == 2:
            return 5 if io else 3
        if io:
            return (5, 5, 5) if iso else (1, 5, 5)
        return (3, 3, 3) if iso else (1, 3, 3)

    def _down(self, iso: bool):
        if self.spatial_rank == 2:
            return 2
        return 2 if iso else (1, 2, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        depth = len(self.filters)
        # 'residual_se_pa' (BasicBlock3dPASE) folds to the SE variant
        block_cls = _BLOCKS.get(self.block_type, BasicBlockSE)
        shared = dict(
            spatial_rank=self.spatial_rank, pad_mode=self.pad_mode,
            act_mode=self.act_mode, norm_mode=self.norm_mode,
            train=self.train, dtype=self.dtype,
        )
        io_iso = self.is_isotropic or self.spatial_rank == 2
        x = ConvNormAct(self.filters[0], self._kernel(io_iso, io=True),
                        name="conv_in", **shared)(x)

        # encoder
        skips = []
        for i in range(depth):
            iso = self._iso(i)
            if i > 0:
                if self.pooling:
                    window = self._down(iso)
                    if isinstance(window, int):
                        window = (window,) * self.spatial_rank
                    x = nn.max_pool(x, window, strides=window)
                    stride = 1
                else:
                    stride = self._down(iso)
            else:
                stride = 1
            x = ConvNormAct(self.filters[i], self._kernel(iso), strides=stride,
                            name=f"down{i}_conv", **shared)(x)
            # the reference never forwards isotropy to the residual blocks
            # (unet.py:91: block(..., **shared_kwargs)); BasicBlock3d
            # defaults to anisotropic (1, 3, 3) kernels at every stage
            x = block_cls(self.filters[i], isotropic=False,
                          name=f"down{i}_block", **shared)(x)
            if i < depth - 1:
                skips.append(x)

        feat = None
        if self.plus:
            x = NonLocalBlock(self.filters[-1], spatial_rank=self.spatial_rank,
                              norm_mode=self.norm_mode, train=self.train,
                              dtype=self.dtype, name="non_local")(x)
            feat = x

        # decoder
        align = not self.pooling  # unet.py:151
        for j in range(depth - 1):
            i = depth - 2 - j
            iso = self._iso(i + 1)
            x = ConvNormAct(self.filters[i], self._kernel(iso),
                            name=f"up{i}_conv", **shared)(x)
            x = linear_resize(x, skips[i].shape[1:-1], align_corners=align) + skips[i]
            if self.plus:
                f = ConvNormAct(self.filters[i], 1, name=f"feat{i}", **shared)(feat)
                x = linear_resize(f, x.shape[1:-1], align_corners=align) + x
            x = block_cls(self.filters[i], isotropic=False,
                          name=f"up{i}_block", **shared)(x)

        return ConvNormAct(
            self.out_channel, self._kernel(io_iso, io=True), use_bias=True,
            spatial_rank=self.spatial_rank, pad_mode=self.pad_mode,
            norm_mode="none", act_mode="none", train=self.train,
            dtype=self.dtype, name="conv_out",
        )(x).astype(jnp.float32)


class UNet3D(_UNetBase):
    spatial_rank: int = 3
    plus: bool = False


class UNet2D(_UNetBase):
    spatial_rank: int = 2
    plus: bool = False


class UNetPlus3D(_UNetBase):
    spatial_rank: int = 3
    plus: bool = True


class UNetPlus2D(_UNetBase):
    spatial_rank: int = 2
    plus: bool = True
