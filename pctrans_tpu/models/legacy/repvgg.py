"""RepVGG-3D backbone with train->deploy reparameterization.

Reference: connectomics/model/backbone/repvgg.py (RepVGGBlock3D:108-205,
RepVGG3D:208-296).  Train mode computes three parallel branches per block
(3x3-conv+BN, 1x1-conv+BN, identity BN when shapes allow); deploy mode is a
single biased 3x3 conv whose weights are the BN-fused sum of the branches.
:func:`repvgg_convert` performs the fusion on a flax variables tree (the
analogue of ``repvgg_convert_model`` / ``repvgg_convert_as_backbone``,
repvgg.py:262-296, used by the reference checkpoint loader
model/build.py:105-119).

Anisotropic blocks use (1, 3, 3) kernels; the identity BN fuses to a delta
kernel at the kernel center (repvgg.py:178-186).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import get_legacy_activation, pad_spatial


class RepVGGBlock3D(nn.Module):
    planes: int
    strides: Tuple[int, int, int] = (1, 1, 1)
    isotropic: bool = False
    pad_mode: str = "zeros"
    act_mode: str = "relu"
    deploy: bool = False
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_legacy_activation(self.act_mode)
        k = (3, 3, 3) if self.isotropic else (1, 3, 3)

        if self.deploy:
            h = pad_spatial(x, k, (1, 1, 1), self.pad_mode)
            y = nn.Conv(self.planes, k, strides=self.strides, padding="VALID",
                        use_bias=True, dtype=self.dtype, name="rbr_reparam")(h)
            return act(y)

        def conv_bn(h, kernel, name):
            h = pad_spatial(h, kernel, (1, 1, 1), self.pad_mode)
            h = nn.Conv(self.planes, kernel, strides=self.strides,
                        padding="VALID", use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv")(h)
            return nn.BatchNorm(use_running_average=not self.train,
                                momentum=0.9, epsilon=1e-5,
                                name=f"{name}_bn")(h)

        y = conv_bn(x, k, "rbr_dense") + conv_bn(x, (1, 1, 1), "rbr_1x1")
        if x.shape[-1] == self.planes and all(s == 1 for s in self.strides):
            y = y + nn.BatchNorm(use_running_average=not self.train,
                                 momentum=0.9, epsilon=1e-5,
                                 name="rbr_identity_bn")(x)
        return act(y)


class RepVGG3D(nn.Module):
    """5-stage RepVGG backbone (repvgg.py:208-258); input [B, D, H, W, C],
    returns the per-stage feature dict (feat1..feat5)."""

    filters: Sequence[int] = (28, 36, 48, 64, 80)
    blocks: Sequence[int] = (4, 4, 4, 4)
    isotropy: Sequence[bool] = (False, False, False, True, True)
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    deploy: bool = False
    feature_keys: Sequence[str] = ("feat1", "feat2", "feat3", "feat4", "feat5")
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        shared = dict(pad_mode=self.pad_mode, act_mode=self.act_mode,
                      deploy=self.deploy, train=self.train, dtype=self.dtype)
        feats = {}
        x = RepVGGBlock3D(self.filters[0], isotropic=self.isotropy[0],
                          name="layer0_block0", **shared)(x)
        feats[self.feature_keys[0]] = x
        for s in range(1, len(self.filters)):
            iso = self.isotropy[s]
            stride = (2, 2, 2) if iso else (1, 2, 2)
            x = RepVGGBlock3D(self.filters[s], strides=stride, isotropic=iso,
                              name=f"layer{s}_block0", **shared)(x)
            for b in range(1, self.blocks[s - 1]):
                x = RepVGGBlock3D(self.filters[s], isotropic=iso,
                                  name=f"layer{s}_block{b}", **shared)(x)
            feats[self.feature_keys[s]] = x
        return feats


def _fuse_conv_bn(kernel, bn_p, bn_s):
    """Fold BN into a conv kernel (flax layout [kd, kh, kw, Cin, Cout])."""
    std = np.sqrt(np.asarray(bn_s["var"]) + 1e-5)
    t = np.asarray(bn_p["scale"]) / std                      # [Cout]
    fused_k = np.asarray(kernel) * t                          # broadcast on Cout
    fused_b = np.asarray(bn_p["bias"]) - np.asarray(bn_s["mean"]) * t
    return fused_k, fused_b


def _block_deploy_params(p: Dict, s: Dict) -> Dict:
    """Fuse one RepVGGBlock3D's train-mode branch params into the deploy
    conv (the per-block math of repvgg.py get_equivalent_kernel_bias)."""
    kd, bd = _fuse_conv_bn(p["rbr_dense_conv"]["kernel"],
                           p["rbr_dense_bn"], s["rbr_dense_bn"])
    k1, b1 = _fuse_conv_bn(p["rbr_1x1_conv"]["kernel"],
                           p["rbr_1x1_bn"], s["rbr_1x1_bn"])
    kdd, khh, kww, cin, cout = kd.shape
    pad_d = (kdd - 1) // 2
    k1_padded = np.zeros_like(kd)
    k1_padded[pad_d, 1, 1] = k1[0, 0, 0]
    kernel = kd + k1_padded
    bias = bd + b1
    if "rbr_identity_bn" in p:
        # identity branch == delta-kernel conv; fuse its BN the same way
        ident = np.zeros((kdd, khh, kww, cin, cout), np.float32)
        for i in range(cout):
            ident[pad_d, 1, 1, i % cin, i] = 1.0
        ki, bi = _fuse_conv_bn(ident, p["rbr_identity_bn"],
                               s["rbr_identity_bn"])
        kernel = kernel + ki
        bias = bias + bi
    return {"kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(bias)}


def repvgg_convert(variables: Dict) -> Dict:
    """Convert a train-mode RepVGG3D variables tree ({'params', 'batch_stats'})
    into deploy-mode params ({'params': {block: {'rbr_reparam': ...}}})."""
    params, stats = variables["params"], variables["batch_stats"]
    out = {}
    for name, p in params.items():
        if isinstance(p, dict) and "rbr_dense_conv" in p:  # one block
            out[name] = {"rbr_reparam": _block_deploy_params(p, stats[name])}
        else:  # non-RepVGG submodule: passes through unchanged
            out[name] = p
    return {"params": out}
