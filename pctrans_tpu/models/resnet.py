"""ResNet backbone (detectron2-compatible R-50) in flax, NHWC.

The reference uses detectron2's ``build_resnet_backbone`` with
``STRIDE_IN_1X1: False``, ``FREEZE_AT: 0`` and FrozenBN, initialized from
ImageNet ``R-50.pkl`` (configs/CVPPP/CVPPP-PCTrans-Base.yaml:14-27,
arch/maskformer.py:74).  This is a from-scratch flax implementation of the
same topology; ``convert_d2_r50_pickle`` maps a detectron2 R-50 checkpoint
into this module's parameter tree so "fine-tune from ImageNet" is
reproducible on TPU.

Padding is explicit (torch-style symmetric) rather than SAME so feature map
sizes and values match torch exactly for stride-2 convolutions on even
inputs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import get_norm

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = False
    norm: str = "FrozenBN"
    train: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)

        def conv(y, feats, k, s, name):
            pad = k // 2
            y = nn.Conv(
                feats, (k, k), strides=(s, s), padding=[(pad, pad), (pad, pad)],
                use_bias=False, kernel_init=_KAIMING, dtype=self.dtype, name=name,
            )(y)
            return get_norm(self.norm, feats, self.train, self.axis_name)(y)

        if in_channels != self.out_channels:
            shortcut = conv(x, self.out_channels, 1, self.stride, "shortcut")
        else:
            shortcut = x

        y = nn.relu(conv(x, self.bottleneck_channels, 1, s1, "conv1"))
        y = nn.relu(conv(y, self.bottleneck_channels, 3, s3, "conv2"))
        y = conv(y, self.out_channels, 1, 1, "conv3")
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """ResNet with detectron2 stage naming (stem, res2..res5)."""

    depth: int = 50
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = False
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    train: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        # depth 14: one bottleneck per stage — a test/CI-sized backbone
        blocks_per_stage = {14: [1, 1, 1, 1], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}[self.depth]

        # stem: 7x7/2 conv + norm + relu + 3x3/2 maxpool
        y = nn.Conv(
            self.stem_out_channels, (7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], use_bias=False, kernel_init=_KAIMING,
            dtype=self.dtype, name="stem_conv1",
        )(x)
        y = get_norm(self.norm, self.stem_out_channels, self.train, self.axis_name)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs = {}
        out_ch = self.res2_out_channels
        bottleneck = out_ch // 4
        for stage_idx, num_blocks in enumerate(blocks_per_stage):
            name = f"res{stage_idx + 2}"
            first_stride = 1 if stage_idx == 0 else 2
            for b in range(num_blocks):
                y = BottleneckBlock(
                    out_channels=out_ch,
                    bottleneck_channels=bottleneck,
                    stride=first_stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    norm=self.norm,
                    train=self.train,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"{name}_block{b}",
                )(y)
            if name in self.out_features:
                outputs[name] = y
            out_ch *= 2
            bottleneck *= 2
        return outputs


# --------------------------------------------------------------------------
# detectron2 R-50.pkl conversion
# --------------------------------------------------------------------------
def convert_d2_r50_pickle(path: str, depth: int = 50):
    """Convert a detectron2 ``R-50.pkl`` checkpoint to (params, frozen) trees.

    The pickle holds a dict with a ``model`` key of numpy arrays named e.g.
    ``stem.conv1.weight``, ``res2.0.conv1.norm.running_mean`` (detectron2
    naming).  Conv kernels are converted OIHW -> HWIO.  Returns two nested
    dicts matching :class:`ResNet` with ``norm='FrozenBN'``: the ``params``
    collection (conv kernels) and the ``frozen`` collection (BN stats).
    """
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    weights = data.get("model", data)

    blocks_per_stage = {14: [1, 1, 1, 1], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}[depth]
    params: Dict = {}
    frozen: Dict = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)

    def conv_kernel(name):
        w = np.asarray(weights[name + ".weight"])
        return w.transpose(2, 3, 1, 0)  # OIHW -> HWIO

    def bn_stats(name):
        return dict(
            scale=jnp.asarray(weights[name + ".norm.weight"]),
            bias=jnp.asarray(weights[name + ".norm.bias"]),
            mean=jnp.asarray(weights[name + ".norm.running_mean"]),
            var=jnp.asarray(weights[name + ".norm.running_var"]),
        )

    put(params, ["stem_conv1", "kernel"], conv_kernel("stem.conv1"))
    frozen["FrozenBatchNorm_0"] = bn_stats("stem.conv1")

    # Module -> flax naming: each BottleneckBlock holds convs named
    # shortcut/conv1/conv2/conv3 with FrozenBatchNorm_{i} in declaration order.
    for stage_idx, num_blocks in enumerate(blocks_per_stage):
        stage = f"res{stage_idx + 2}"
        for b in range(num_blocks):
            d2 = f"{stage}.{b}"
            fl = f"{stage}_block{b}"
            block_p: Dict = {}
            block_f: Dict = {}
            norm_i = 0
            if f"{d2}.shortcut.weight" in weights:
                block_p["shortcut"] = {"kernel": jnp.asarray(conv_kernel(f"{d2}.shortcut"))}
                block_f[f"FrozenBatchNorm_{norm_i}"] = bn_stats(f"{d2}.shortcut")
                norm_i += 1
            for conv in ("conv1", "conv2", "conv3"):
                block_p[conv] = {"kernel": jnp.asarray(conv_kernel(f"{d2}.{conv}"))}
                block_f[f"FrozenBatchNorm_{norm_i}"] = bn_stats(f"{d2}.{conv}")
                norm_i += 1
            params[fl] = block_p
            frozen[fl] = block_f

    return params, frozen
