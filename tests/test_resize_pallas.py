"""Fused upsample+binarize kernel vs the XLA resize path.

The kernel's dots use bf16 operands with f32 accumulation (the same
quantization XLA's default-precision dots apply on TPU), so against the
CPU's full-f32 XLA path the binarized outputs may legitimately differ only
where the interpolated logit sits within bf16 noise of the threshold.
These tests assert (a) exact agreement away from the threshold margin and
(b) that any disagreeing pixel is provably borderline.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pctrans_tpu.ops.resize import resize_bilinear
from pctrans_tpu.ops.resize_pallas import (
    _pallas_resize_binarize,
    resize_weights,
)


@pytest.mark.parametrize("shape,size", [
    ((2, 3, 17, 21), (68, 84)),     # clean 4x
    ((1, 4, 13, 16), (50, 61)),     # non-integer scale, odd sizes
])
def test_kernel_matches_xla_resize_away_from_threshold(rng, shape, size):
    t = 0.8
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2.0)
    ref_f32 = np.asarray(resize_bilinear(x, size))
    ref_bin = (ref_f32 > t).astype(np.uint8)
    out = np.asarray(_pallas_resize_binarize(x, size, t, interpret=True))
    # bf16 operand truncation bounds the value error at ~1e-2 relative
    margin = 2e-2 * (np.abs(ref_f32) + 1.0)
    disagree = out != ref_bin
    assert (np.abs(ref_f32[disagree] - t) <= margin[disagree]).all()
    solid = np.abs(ref_f32 - t) > margin
    np.testing.assert_array_equal(out[solid], ref_bin[solid])
    # and the kernel must actually paint both classes on this data
    assert out.any() and (out == 0).any()


def test_resize_weights_reproduce_resize(rng):
    """resize(x) == W_h @ x @ W_w^T exactly (linearity of the resize),
    proving the kernel's weight construction matches jax.image.resize."""
    x = jnp.asarray(rng.randn(9, 11).astype(np.float32))
    H, W = 31, 27
    ref = np.asarray(resize_bilinear(x[None, None], (H, W)))[0, 0]
    wh = np.asarray(resize_weights(9, H))
    ww = np.asarray(resize_weights(11, W))
    np.testing.assert_allclose(wh @ np.asarray(x) @ ww.T, ref,
                               rtol=1e-5, atol=1e-5)
