"""Native (C++) metrics library vs the numpy implementations."""

import numpy as np
import pytest

from pctrans_tpu.inference import native
from pctrans_tpu.inference import metrics_cvppp as mc
from pctrans_tpu.inference.postprocess import pairwise_dice_binary

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (make -C native)"
)


def test_symmetric_best_dice_matches(rng):
    for _ in range(5):
        a = rng.randint(0, 7, (48, 48)).astype(np.uint16)
        b = rng.randint(0, 6, (48, 48)).astype(np.uint16)
        sbd, bd1, bd2 = native.symmetric_best_dice(a, b)
        assert sbd == pytest.approx(mc.SymmetricBestDice(a, b), abs=1e-12)
        assert bd1 == pytest.approx(mc.BestDice(a, b), abs=1e-12)
        assert bd2 == pytest.approx(mc.BestDice(b, a), abs=1e-12)


def test_diff_fg_labels_matches(rng):
    a = rng.randint(0, 7, (32, 32)).astype(np.uint16)
    b = rng.randint(0, 4, (32, 32)).astype(np.uint16)
    assert native.diff_fg_labels(a, b) == pytest.approx(mc.DiffFGLabels(a, b))


def test_pairwise_dice_matches(rng):
    m = (rng.rand(6, 24, 24) > 0.6).astype(np.float32)
    np.testing.assert_allclose(
        native.pairwise_dice(m), pairwise_dice_binary(m), atol=1e-9
    )
