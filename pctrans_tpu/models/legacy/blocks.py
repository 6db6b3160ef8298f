"""Block zoo for the legacy architectures (reference connectomics/model/block/).

Dimension-generic flax modules: ``spatial_rank`` 2 covers the reference's
``*2d`` blocks ([B, H, W, C]), 3 the ``*3d`` ones ([B, D, H, W, C]).
Covers ``conv{2,3}d_norm_act`` (block/basic.py:11-41), the residual blocks
(block/residual.py:17-171), SE layers (block/att_layer.py) and the
non-local block (block/non_local.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

_PAD_MODES = {"zeros": "constant", "replicate": "edge", "reflect": "reflect",
              "circular": "wrap"}


def get_legacy_activation(name: str) -> Callable:
    """Activation factory (reference model/utils/misc.py get_activation)."""
    acts = {
        "relu": nn.relu,
        "leaky_relu": lambda x: nn.leaky_relu(x, 0.2),
        "elu": nn.elu,
        "gelu": nn.gelu,
        "swish": nn.swish,
        "efficient_swish": nn.swish,
        "sigmoid": nn.sigmoid,
        "tanh": jnp.tanh,
        "none": lambda x: x,
    }
    return acts[name]


def get_legacy_norm(name: str, features: int, train: bool = True,
                    spatial_rank: int = 3):
    """Norm factory (reference get_norm_2d/get_norm_3d): bn / sync_bn / in /
    gn / none.  BatchNorm statistics live in the ``batch_stats`` collection;
    under a sharded jit program batch stats are global, which subsumes
    sync_bn (reference model/build.py:80-81)."""
    if name in ("bn", "sync_bn"):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)
    if name == "in":
        # InstanceNorm = GroupNorm with one channel per group; the reference
        # uses torch InstanceNorm with affine=False (misc.py:352,377), so no
        # learnable scale/bias
        return nn.GroupNorm(epsilon=1e-5, num_groups=None, group_size=1,
                            use_scale=False, use_bias=False)
    if name == "gn":
        # reference group counts: 8 for 3D models, 16 for 2D
        # (misc.py:353,378); both require divisibility.  Channel counts
        # below the group count (tiny test configs) fall back to one
        # channel per group.
        groups = 8 if spatial_rank == 3 else 16
        if features < groups:
            groups = features
        if features % groups:
            raise ValueError(
                f"GN requires channels divisible into {groups} groups "
                f"(got {features}; reference misc.py:348)")
        return nn.GroupNorm(epsilon=1e-5, num_groups=groups)
    if name == "none":
        return None
    raise ValueError(f"Unknown norm: {name}")


def _to_tuple(v, rank: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * rank
    assert len(v) == rank
    return tuple(v)


def pad_spatial(x: jnp.ndarray, kernel_size: Sequence[int],
                dilation: Sequence[int], pad_mode: str) -> jnp.ndarray:
    """SAME-style padding with the reference's padding_mode semantics
    (zeros / replicate / reflect / circular)."""
    pads = [(0, 0)]
    for k, d in zip(kernel_size, dilation):
        eff = d * (k - 1)
        pads.append((eff // 2, eff - eff // 2))
    pads.append((0, 0))
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads, mode=_PAD_MODES[pad_mode])


class ConvNormAct(nn.Module):
    """conv + norm + act (reference conv2d_norm_act / conv3d_norm_act,
    block/basic.py:11-41)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    spatial_rank: int = 2
    strides: Union[int, Sequence[int]] = 1
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = False
    pad_mode: str = "replicate"
    norm_mode: str = "bn"
    act_mode: str = "relu"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = _to_tuple(self.kernel_size, self.spatial_rank)
        dil = _to_tuple(self.dilation, self.spatial_rank)
        x = pad_spatial(x, ks, dil, self.pad_mode)
        x = nn.Conv(
            self.features, ks,
            strides=_to_tuple(self.strides, self.spatial_rank),
            kernel_dilation=dil,
            feature_group_count=self.groups,
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        norm = get_legacy_norm(self.norm_mode, self.features, self.train,
                               self.spatial_rank)
        if norm is not None:
            x = norm(x)
        return get_legacy_activation(self.act_mode)(x)


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference block/att_layer.py SELayer2d/3d)."""

    channels: int
    reduction: int = 4
    spatial_rank: int = 2

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, 1 + self.spatial_rank))
        y = x.mean(axis=axes)                      # [B, C]
        y = nn.Dense(self.channels // self.reduction, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, name="fc2")(y)
        y = nn.sigmoid(y)
        y = y.reshape(y.shape[:1] + (1,) * self.spatial_rank + y.shape[1:])
        return x * y


class BasicBlock(nn.Module):
    """Residual basic block (reference BasicBlock2d/BasicBlock3d,
    block/residual.py:17-88): two conv-norm(-act) + projected skip + act.
    Anisotropic 3D mode uses (1, 3, 3) kernels (residual.py:65-68)."""

    planes: int
    spatial_rank: int = 2
    strides: Union[int, Sequence[int]] = 1
    dilation: int = 1
    projection: bool = False
    isotropic: bool = True
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    def _kernel(self):
        if self.spatial_rank == 3 and not self.isotropic:
            return (1, 3, 3)
        return 3

    @nn.compact
    def __call__(self, x):
        shared = dict(
            spatial_rank=self.spatial_rank, pad_mode=self.pad_mode,
            norm_mode=self.norm_mode, train=self.train, dtype=self.dtype,
        )
        y = ConvNormAct(self.planes, self._kernel(), strides=self.strides,
                        dilation=self.dilation, act_mode=self.act_mode,
                        name="conv1", **shared)(x)
        y = ConvNormAct(self.planes, self._kernel(), dilation=self.dilation,
                        act_mode="none", name="conv2", **shared)(y)
        strides = _to_tuple(self.strides, self.spatial_rank)
        if x.shape[-1] != self.planes or any(s != 1 for s in strides) or self.projection:
            x = ConvNormAct(self.planes, 1, strides=self.strides,
                            act_mode="none", name="projector", **shared)(x)
        return get_legacy_activation(self.act_mode)(y + x)


class BasicBlockSE(nn.Module):
    """BasicBlock + SE before the residual add (BasicBlock2dSE/3dSE,
    residual.py:136-157)."""

    planes: int
    spatial_rank: int = 2
    strides: Union[int, Sequence[int]] = 1
    dilation: int = 1
    projection: bool = False
    isotropic: bool = True
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # reference ordering: conv stack -> SE -> add -> act
        shared = dict(spatial_rank=self.spatial_rank, pad_mode=self.pad_mode,
                      norm_mode=self.norm_mode, train=self.train,
                      dtype=self.dtype)
        k = (1, 3, 3) if (self.spatial_rank == 3 and not self.isotropic) else 3
        y = ConvNormAct(self.planes, k, strides=self.strides,
                        dilation=self.dilation, act_mode=self.act_mode,
                        name="conv1", **shared)(x)
        y = ConvNormAct(self.planes, k, dilation=self.dilation,
                        act_mode="none", name="conv2", **shared)(y)
        y = SELayer(self.planes, spatial_rank=self.spatial_rank, name="se")(y)
        strides = _to_tuple(self.strides, self.spatial_rank)
        if x.shape[-1] != self.planes or any(s != 1 for s in strides) or self.projection:
            x = ConvNormAct(self.planes, 1, strides=self.strides,
                            act_mode="none", name="projector", **shared)(x)
        return get_legacy_activation(self.act_mode)(y + x)


class BasicBlockPA(nn.Module):
    """Pre-activation residual block (BasicBlock3dPA, residual.py:90-133):
    norm-act-conv twice, no output activation."""

    planes: int
    spatial_rank: int = 3
    strides: Union[int, Sequence[int]] = 1
    dilation: int = 1
    projection: bool = False
    isotropic: bool = True
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (1, 3, 3) if (self.spatial_rank == 3 and not self.isotropic) else 3
        ks = _to_tuple(k, self.spatial_rank)
        dil = _to_tuple(self.dilation, self.spatial_rank)
        act = get_legacy_activation(self.act_mode)

        def norm_act_conv(h, strides, name):
            norm = get_legacy_norm(self.norm_mode, h.shape[-1], self.train,
                                   self.spatial_rank)
            if norm is not None:
                h = norm(h)
            h = act(h)
            h = pad_spatial(h, ks, dil, self.pad_mode)
            return nn.Conv(self.planes, ks,
                           strides=_to_tuple(strides, self.spatial_rank),
                           kernel_dilation=dil, padding="VALID",
                           use_bias=False, dtype=self.dtype, name=name)(h)

        y = norm_act_conv(x, self.strides, "conv1")
        y = norm_act_conv(y, 1, "conv2")
        strides = _to_tuple(self.strides, self.spatial_rank)
        if x.shape[-1] != self.planes or any(s != 1 for s in strides) or self.projection:
            x = ConvNormAct(self.planes, 1, spatial_rank=self.spatial_rank,
                            strides=self.strides, act_mode="none",
                            pad_mode=self.pad_mode, norm_mode=self.norm_mode,
                            train=self.train, dtype=self.dtype,
                            name="projector")(x)
        return y + x


class NonLocalBlock(nn.Module):
    """Embedded-Gaussian non-local block (reference block/non_local.py,
    used by UNetPlus, arch/unet.py:196-197): theta/phi/g 1x1 projections at
    C/2, softmax attention over all positions, 1x1 W back to C with a
    residual connection."""

    channels: int
    spatial_rank: int = 2
    sub_sample: bool = False
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        C = self.channels
        inter = max(C // 2, 1)
        spatial = x.shape[1:-1]
        n = 1
        for s in spatial:
            n *= s

        theta = nn.Conv(inter, (1,) * self.spatial_rank, dtype=self.dtype,
                        name="theta")(x).reshape(B, n, inter)
        phi_in = g_in = x
        if self.sub_sample:
            window = (1,) * (self.spatial_rank - 2) + (2, 2)
            phi_in = nn.max_pool(x, window, strides=window)
            g_in = phi_in
        m = 1
        for s in phi_in.shape[1:-1]:
            m *= s
        phi = nn.Conv(inter, (1,) * self.spatial_rank, dtype=self.dtype,
                      name="phi")(phi_in).reshape(B, m, inter)
        g = nn.Conv(inter, (1,) * self.spatial_rank, dtype=self.dtype,
                    name="g")(g_in).reshape(B, m, inter)

        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi).astype(jnp.float32), -1
        ).astype(x.dtype)
        y = jnp.einsum("bnm,bmc->bnc", attn, g).reshape(B, *spatial, inter)
        y = nn.Conv(C, (1,) * self.spatial_rank, dtype=self.dtype, name="w")(y)
        norm = get_legacy_norm(self.norm_mode, C, self.train,
                               self.spatial_rank)
        if norm is not None:
            y = norm(y)
        return y + x


def linear_resize(x: jnp.ndarray, size: Sequence[int],
                  align_corners: bool = False) -> jnp.ndarray:
    """N-D separable linear resize over the spatial dims of a channels-last
    tensor (torch ``interpolate(mode='bilinear'/'trilinear')`` semantics for
    both ``align_corners`` settings; the legacy U-Nets use align_corners=True
    when downsampling by stride, arch/unet.py:143-153)."""
    rank = len(size)
    assert x.ndim == rank + 2
    for axis, out_n in enumerate(size, start=1):
        in_n = x.shape[axis]
        if in_n == out_n:
            continue
        if align_corners and out_n > 1:
            pos = jnp.arange(out_n, dtype=jnp.float32) * ((in_n - 1) / (out_n - 1))
        else:
            scale = in_n / out_n
            pos = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * scale - 0.5
        pos = jnp.clip(pos, 0.0, in_n - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        t = (pos - lo).astype(x.dtype)
        xl = jnp.take(x, lo, axis=axis)
        xh = jnp.take(x, hi, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_n
        t = t.reshape(shape)
        x = xl * (1 - t) + xh * t
    return x
