"""EfficientNet-3D backbone (reference connectomics/model/backbone/
efficientnet.py:24-125 with block/residual.py InvertedResidual:173-249).

Five stages of depthwise inverted-residual stacks (``dw_stack``:112-125):
per block 1x1 expand -> depthwise kxkxk (or 1xkxk anisotropic) -> optional
squeeze-excitation -> 1x1 project, with an avg-pool + 1x1 projector skip on
strided blocks.  Stage strides 1/2/2/(1,2,2)/2 per the reference layer
wiring (:86-95); expansion factor 1.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .blocks import SELayer, get_legacy_activation, get_legacy_norm, pad_spatial


def _to3(v):
    return (v,) * 3 if isinstance(v, int) else tuple(v)


class InvertedResidual3D(nn.Module):
    out_ch: int
    kernel_size: int = 3
    strides: Union[int, Tuple[int, int, int]] = 1
    expansion_factor: int = 1
    attention: str = "squeeze_excitation"
    isotropic: bool = False
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_legacy_activation(self.act_mode)
        in_ch = x.shape[-1]
        mid = in_ch * self.expansion_factor
        k = ((self.kernel_size,) * 3 if self.isotropic
             else (1, self.kernel_size, self.kernel_size))
        strides = _to3(self.strides)

        def norm(h):
            n = get_legacy_norm(self.norm_mode, h.shape[-1], self.train)
            return n(h) if n is not None else h

        y = nn.Conv(mid, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="expand")(x)
        y = act(norm(y))
        y = pad_spatial(y, k, (1, 1, 1), self.pad_mode)
        y = nn.Conv(mid, k, strides=strides, feature_group_count=mid,
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    name="dwconv")(y)
        y = act(norm(y))
        if self.attention == "squeeze_excitation":
            y = SELayer(mid, spatial_rank=3, name="se")(y)
        y = norm(nn.Conv(self.out_ch, (1, 1, 1), use_bias=False,
                         dtype=self.dtype, name="project")(y))

        shortcut = x
        if any(s != 1 for s in strides):
            shortcut = nn.avg_pool(shortcut, strides, strides=strides)
            shortcut = norm(nn.Conv(self.out_ch, (1, 1, 1), use_bias=False,
                                    dtype=self.dtype, name="projector")(shortcut))
        elif in_ch != self.out_ch:
            shortcut = norm(nn.Conv(self.out_ch, (1, 1, 1), use_bias=False,
                                    dtype=self.dtype, name="projector")(shortcut))
        if shortcut.shape[1:4] != y.shape[1:4]:
            # odd-size stride: conv ceils, pool floors — edge-pad the skip
            # (the reference replicate-pads the identity, residual.py:231-239)
            pads = [(0, 0)] + [(0, ys - ss) for ys, ss in
                               zip(y.shape[1:4], shortcut.shape[1:4])] + [(0, 0)]
            shortcut = jnp.pad(shortcut, pads, mode="edge")
        return y + shortcut


class EfficientNet3D(nn.Module):
    filters: Sequence[int] = (32, 64, 96, 128, 160)
    blocks: Sequence[int] = (1, 2, 2, 2, 4)
    ks: Sequence[int] = (3, 3, 5, 3, 3)
    isotropy: Sequence[bool] = (False, False, False, True, True)
    attention: str = "squeeze_excitation"
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    feature_keys: Sequence[str] = ("feat1", "feat2", "feat3", "feat4", "feat5")
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        act = get_legacy_activation(self.act_mode)
        x = pad_spatial(x, (3, 3, 3), (1, 1, 1), self.pad_mode)
        x = nn.Conv(self.filters[0], (3, 3, 3), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        n = get_legacy_norm(self.norm_mode, self.filters[0], self.train)
        x = act(n(x) if n is not None else x)

        # stage strides per reference wiring (:86-95); stage 3 is (1, 2, 2)
        strides = (1, 2, 2, (1, 2, 2), 2)
        feats = {}
        in_ch = self.filters[0]
        for s in range(len(self.filters)):
            iso = self.isotropy[s]
            for b in range(self.blocks[s]):
                x = InvertedResidual3D(
                    self.filters[s], kernel_size=self.ks[s],
                    strides=strides[s] if b == 0 else 1,
                    attention=self.attention, isotropic=iso,
                    pad_mode=self.pad_mode, act_mode=self.act_mode,
                    norm_mode=self.norm_mode, train=self.train,
                    dtype=self.dtype, name=f"layer{s}_block{b}")(x)
            feats[self.feature_keys[s]] = x
        return feats
