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
_C2_BRANCH = {"branch1": "shortcut", "branch2a": "conv1",
              "branch2b": "conv2", "branch2c": "conv3"}


def _caffe2_to_d2_names(weights):
    """Map the detectron2 model-zoo ``R-50.pkl`` Caffe2 key manifest to
    d2-native names.

    The real ImageNet pickle (``detectron2://ImageNetPretrained/MSRA/
    R-50.pkl``, the file the reference configs point MODEL.WEIGHTS at —
    configs/CVPPP/CVPPP-PCTrans-Base.yaml:27) is Caffe2-format:
    ``conv1_w``, ``res_conv1_bn_s/_b``, ``res{2..5}_{i}_branch{1,2a,2b,2c}_w``
    with ``_bn_s``/``_bn_b`` affine pairs, a ``fc1000_w/_b`` classifier head,
    and NO running mean/var (absorbed into the affine at conversion time —
    detectron2's FrozenBatchNorm2d defaults the missing buffers to mean 0 /
    var 1-eps).  Same mapping as detectron2's
    ``c2_model_loading.convert_basic_c2_names``.
    """
    import re

    out = {}
    for k, v in weights.items():
        if not hasattr(v, "shape"):
            continue  # metadata entries (e.g. lr, model_iter)
        if k.startswith("fc1000"):
            continue  # ImageNet classifier head, unused by the backbone
        if k == "conv1_w":
            out["stem.conv1.weight"] = v
        elif k == "res_conv1_bn_s":
            out["stem.conv1.norm.weight"] = v
        elif k == "res_conv1_bn_b":
            out["stem.conv1.norm.bias"] = v
        else:
            m = re.match(
                r"res(\d)_(\d+)_(branch1|branch2a|branch2b|branch2c)"
                r"_(w|b|bn_s|bn_b)$", k)
            if m is None:
                raise KeyError(f"unrecognized Caffe2 R-50 key: {k!r}")
            stage, block, branch, suffix = m.groups()
            name = f"res{stage}.{block}.{_C2_BRANCH[branch]}"
            sfx = {"w": "weight", "b": "bias",
                   "bn_s": "norm.weight", "bn_b": "norm.bias"}[suffix]
            out[f"{name}.{sfx}"] = v
    return out


def convert_d2_r50_pickle(path: str, depth: int = 50,
                          conv1_bgr_to_rgb: bool = True):
    """Convert a detectron2 ``R-50.pkl`` checkpoint to (params, frozen) trees.

    Accepts BOTH on-disk formats:

    * d2-native: ``stem.conv1.weight``, ``res2.0.conv1.norm.running_mean``
      (what ``DetectionCheckpointer`` re-saves);
    * Caffe2 model-zoo (the actual ImageNet ``R-50.pkl`` the reference
      trains from): ``conv1_w`` / ``res2_0_branch2a_bn_s`` naming, detected
      by the ``conv1_w`` key and mapped via :func:`_caffe2_to_d2_names`.
      Missing running stats default to mean 0 / var 1-eps (detectron2
      ``FrozenBatchNorm2d`` buffer defaults, so the folded scale is exactly
      the stored affine weight).

    The Caffe2 weights were converted from Caffe and expect **BGR** input;
    this pipeline feeds RGB (the CVPPP/BBBC loaders normalize RGB with
    ImageNet stats, data/cvppp.py), so by default the conv1 input channels
    are flipped to RGB order.  ``conv1_bgr_to_rgb=False`` replicates the
    reference's as-published behavior instead, which loads the BGR kernel
    unchanged while feeding RGB tensors (detectron2 only handles the BGR
    convention inside its own DatasetMapper, which the reference bypasses —
    dataset_CVPPP.py:103-119 feeds RGB straight to the d2 backbone).

    Conv kernels are converted OIHW -> HWIO.  Returns two nested dicts
    matching :class:`ResNet` with ``norm='FrozenBN'``: the ``params``
    collection (conv kernels) and the ``frozen`` collection (BN stats).
    """
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    weights = data.get("model", data)
    caffe2_format = "conv1_w" in weights
    if caffe2_format:
        weights = _caffe2_to_d2_names(weights)
        if conv1_bgr_to_rgb:
            weights["stem.conv1.weight"] = np.ascontiguousarray(
                np.asarray(weights["stem.conv1.weight"])[:, ::-1])

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
        scale = np.asarray(weights[name + ".norm.weight"])
        # Caffe2-converted pickles carry no running stats: detectron2's
        # FrozenBatchNorm2d defaults mean=0, var=1-eps so the folded scale
        # equals the stored affine weight exactly (eps matches
        # layers.FrozenBatchNorm.eps = 1e-5).
        return dict(
            scale=jnp.asarray(scale),
            bias=jnp.asarray(weights[name + ".norm.bias"]),
            mean=jnp.asarray(weights.get(
                name + ".norm.running_mean", np.zeros_like(scale))),
            var=jnp.asarray(weights.get(
                name + ".norm.running_var",
                np.full_like(scale, 1.0 - 1e-5))),
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
