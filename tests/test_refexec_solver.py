"""Optimizer param-group parity vs the EXECUTED reference build_optimizer.

The reference assigns per-parameter (lr, weight_decay) by module type and
param name (engine/solver/build.py:96-168: norm-module params ->
WEIGHT_DECAY_NORM — including the norm's own bias —, other biases ->
BIAS_LR_FACTOR / WEIGHT_DECAY_BIAS, everything else -> WEIGHT_DECAY).
This repo applies the same policy as optax multi_transform masks keyed on
flax param paths (engine/solver.py _is_norm_or_bias_path).  The test runs
the reference's real grouping over a module containing every param class
and checks each assignment against the label my classifier produces for
the equivalent flax path.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# slow tier: executed-reference oracles load and run the reference's own
# torch code — run on demand (pytest -m slow / -m "") , not in the
# driver-facing fast tier (see tests/conftest.py tier banner)
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_exec import load_ref  # noqa: E402

from pctrans_tpu.engine.solver import _is_norm_or_bias_path  # noqa: E402

BASE_LR, WD, WD_NORM, WD_BIAS, BIAS_LR = 1e-4, 0.05, 0.0, 0.01, 2.0


def _cfg():
    S = types.SimpleNamespace
    return S(SOLVER=S(
        BASE_LR=BASE_LR, WEIGHT_DECAY=WD, WEIGHT_DECAY_NORM=WD_NORM,
        WEIGHT_DECAY_BIAS=WD_BIAS, BIAS_LR_FACTOR=BIAS_LR, NAME="AdamW",
        BETAS=(0.9, 0.999), MOMENTUM=0.9,
        CLIP_GRADIENTS=S(ENABLED=False, CLIP_TYPE="full_model",
                         CLIP_VALUE=0.0)))


class _Model(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 8, 3, bias=True)
        self.norm1 = torch.nn.LayerNorm(8)
        self.gn = torch.nn.GroupNorm(2, 8)
        self.bn = torch.nn.BatchNorm2d(8)
        self.linear1 = torch.nn.Linear(8, 4, bias=True)


# torch named param -> the equivalent flax param path in this framework
FLAX_PATHS = {
    "conv1.weight": ("conv1", "kernel"),
    "conv1.bias": ("conv1", "bias"),
    "norm1.weight": ("norm1", "scale"),
    "norm1.bias": ("norm1", "bias"),
    "gn.weight": ("GroupNorm_0", "scale"),
    "gn.bias": ("GroupNorm_0", "bias"),
    "bn.weight": ("BatchNorm_0", "scale"),
    "bn.bias": ("BatchNorm_0", "bias"),
    "linear1.weight": ("linear1", "kernel"),
    "linear1.bias": ("linear1", "bias"),
}

LABEL_TO_GROUP = {
    "kernel": (BASE_LR, WD),
    "bias": (BASE_LR * BIAS_LR, WD_BIAS),
    "norm": (BASE_LR, WD_NORM),
}


def test_param_groups_match_executed_reference():
    build = load_ref("connectomics.engine.solver.build")
    model = _Model()
    opt = build.build_optimizer(_cfg(), model)

    by_param = {}
    for group in opt.param_groups:
        for p in group["params"]:
            by_param[id(p)] = (group["lr"], group["weight_decay"])

    for name, p in model.named_parameters():
        ref_lr, ref_wd = by_param[id(p)]
        label = _is_norm_or_bias_path(FLAX_PATHS[name])
        my_lr, my_wd = LABEL_TO_GROUP[label]
        assert (my_lr, my_wd) == (ref_lr, ref_wd), (
            f"{name}: label={label} mine=({my_lr}, {my_wd}) "
            f"ref=({ref_lr}, {ref_wd})")
