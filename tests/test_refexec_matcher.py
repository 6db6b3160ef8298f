"""Matcher parity vs the EXECUTED reference Point_HungarianMatcher.

The reference samples one shared set of uniform points per batch item
(matcher.py:116), point-samples predictions and GT masks there, builds
C = 5*sigmoid_ce + 5*dice and solves it with scipy on the CPU.  Here the
reference module runs unmodified from /root/reference (torch.rand patched
to a fixed sequence so both sides evaluate at identical points) against
this repo's in-jit pipeline: ops.point_sample + sample_label_onehot +
losses.matcher._pair_costs + ops.lap.match_padded.
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

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_exec import load_ref  # noqa: E402

from pctrans_tpu.losses.matcher import _pair_costs  # noqa: E402
from pctrans_tpu.ops.lap import match_padded  # noqa: E402
from pctrans_tpu.ops.point_sample import (  # noqa: E402
    point_sample,
    sample_label_onehot,
)

B, Q, H, W, P, G = 2, 12, 40, 32, 300, 6


def _fixture(rng):
    from pctrans_tpu.data.synthetic import make_blob_image

    logits = rng.randn(B, Q, H, W).astype(np.float32) * 2.0
    segs, n_inst = [], []
    for _ in range(B):
        _, label = make_blob_image(rng, size=(H, W), n_instances=(3, G))
        segs.append(np.minimum(label, G))
        n_inst.append(min(int(label.max()), G))
    return logits, np.stack(segs), n_inst


def test_costs_and_assignment_match_executed_reference(rng, monkeypatch):
    m = load_ref("connectomics.model.loss.matcher")
    logits, segs, n_inst = _fixture(rng)
    coords = rng.rand(B, P, 2).astype(np.float32)

    # run the REFERENCE matcher end-to-end at the fixed points
    calls = iter(range(B))

    def fixed_rand(*shape, device=None):
        assert tuple(shape) == (1, P, 2)
        return torch.from_numpy(coords[next(calls)][None])

    monkeypatch.setattr(m.torch, "rand", fixed_rand)
    matcher = m.Point_HungarianMatcher(cost_mask=5.0, cost_dice=5.0,
                                       num_points=P)
    outputs = {"pred_masks": torch.from_numpy(logits)}
    targets = [
        {"masks": torch.from_numpy(np.stack(
            [(segs[b] == i + 1).astype(np.float32)
             for i in range(n_inst[b])]))}
        for b in range(B)
    ]
    ref_indices = matcher(outputs, targets)

    for b in range(B):
        # my cost pipeline at the SAME points
        out_pts = np.asarray(point_sample(
            jnp.asarray(logits[b][None]), jnp.asarray(coords[b][None]))[0])
        tgt_pts = np.asarray(sample_label_onehot(
            jnp.asarray(segs[b][None]), jnp.asarray(coords[b][None]), G)[0])
        mine_cost = np.asarray(_pair_costs(
            jnp.asarray(out_pts), jnp.asarray(tgt_pts), 5.0, 5.0))

        # the reference cost on its own sampled values
        t_out = m.point_sample(torch.from_numpy(logits[b])[:, None],
                               torch.from_numpy(coords[b][None]).repeat(
                                   Q, 1, 1), align_corners=False).squeeze(1)
        t_tgt = m.point_sample(torch.from_numpy(targets[b]["masks"].numpy())
                               [:, None],
                               torch.from_numpy(coords[b][None]).repeat(
                                   n_inst[b], 1, 1),
                               align_corners=False).squeeze(1)
        ref_cost = (5.0 * m.batch_sigmoid_ce_loss(t_out, t_tgt)
                    + 5.0 * m.batch_dice_loss(t_out, t_tgt)).numpy()
        np.testing.assert_allclose(mine_cost[:, :n_inst[b]], ref_cost,
                                   rtol=1e-4, atol=1e-4)

        # assignment: my padded solver vs the reference's scipy solve
        valid = np.arange(G) < n_inst[b]
        q4g = np.asarray(match_padded(jnp.asarray(mine_cost),
                                      jnp.asarray(valid)))
        rows, cols = ref_indices[b]
        ref_q4g = np.empty(n_inst[b], np.int64)
        ref_q4g[cols.numpy()] = rows.numpy()
        # both are optimal; with random costs the optimum is unique
        assert (q4g[:n_inst[b]] == ref_q4g).all(), (q4g, ref_q4g)
        my_total = mine_cost[q4g[:n_inst[b]], np.arange(n_inst[b])].sum()
        ref_total = ref_cost[ref_q4g, np.arange(n_inst[b])].sum()
        np.testing.assert_allclose(my_total, ref_total, rtol=1e-4)
