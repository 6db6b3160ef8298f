"""TTA parity vs the EXECUTED reference TestAugmentor.

The reference's flip/transpose test-time ensemble (2D path,
test_augmentor.py:139-186) runs unmodified from /root/reference with a
deterministic, deliberately non-equivariant forward function; this repo's
``data/tta.py`` applies the same function through its own variant
machinery.  The blended outputs must agree for every (num_aug, mode)
combination — variant ORDER differs between the two, so agreement proves
each variant's inverse transform is correct, not just the set.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# slow tier: executed-reference oracles load and run the reference's own
# torch code — run on demand (pytest -m slow / -m "") , not in the
# driver-facing fast tier (see tests/conftest.py tier banner)
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_exec import load_ref  # noqa: E402

from pctrans_tpu.data.tta import TestAugmentor as MyTTA  # noqa: E402

B, C, H, W = 2, 3, 12, 12  # square: the 8-variant set transposes x/y


def _torch_fn(x):
    """Deterministic non-flip-equivariant map on [B, C, H, W] with outputs
    in [0, 1] — the regime the reference TTA is used in.  (As published,
    its min/max blends initialize the accumulator to ones/zeros
    (test_augmentor.py:214-218), which silently clamps outputs outside
    [0, 1]; this repo's stack-reduce is exact everywhere and identical on
    probabilities.)"""
    h, w = x.shape[-2:]
    ramp_y = torch.linspace(0.0, 1.0, h)[None, None, :, None]
    ramp_x = torch.linspace(0.0, 2.0, w)[None, None, None, :]
    return torch.sigmoid(x * (1.0 + ramp_y) + ramp_x * x.roll(1, dims=-1)
                         - 1.5)


class _RefModel:
    training = False

    def __call__(self, volume):
        return (_torch_fn(volume), None)


def _my_forward(x_nhwc):
    t = torch.from_numpy(np.ascontiguousarray(x_nhwc)).permute(0, 3, 1, 2)
    return _torch_fn(t).numpy()


@pytest.mark.parametrize("num_aug", [4, 8])
@pytest.mark.parametrize("mode", ["mean", "min", "max"])
def test_tta_2d_matches_executed_reference(rng, num_aug, mode):
    ta_mod = load_ref("connectomics.data.augmentation.test_augmentor")
    data = rng.rand(B, C, H, W).astype(np.float32)

    ref_tta = ta_mod.TestAugmentor(mode=mode, do_2d=True, num_aug=num_aug,
                                   scale_factors=[1.0, 1.0, 1.0])
    ref_out, ref_boundary = ref_tta(_RefModel(), torch.from_numpy(data))
    assert ref_boundary is None
    ref_out = np.asarray(ref_out)

    mine = MyTTA(mode=mode, num_aug=num_aug)
    my_out = mine(_my_forward, data.transpose(0, 2, 3, 1))

    np.testing.assert_allclose(my_out, ref_out, rtol=1e-5, atol=1e-6)
