"""Query-contrast parity vs the EXECUTED reference code.

The query-contrast loss is PCTrans's novel contribution: the decoder
builds per-matched-query contrast items (``select_pos_neg_query`` /
``select_pos_neg_mask``, mask2former_transformer_decoder.py:800-903) and
the criterion reduces them with a logsumexp pairwise loss plus an
auxiliary cosine regression (``loss_reid_query`` / ``loss_reid_mask``,
maskformer_criterion.py:318-383).  Here the reference's own functions run
from /root/reference against this repo's fixed-shape masked
reformulation (losses/contrast.py) on identical inputs.

Determinism note: the reference subsamples aux negatives with
``random.sample`` only when ``|neg| > 10*|pos|``; at Q=8 / 3 matched
queries every item keeps ALL negatives (a permutation — set-invariant for
both loss terms), so the comparison is exact without patching RNG.  The
main contrastive terms never subsample and are additionally compared at
a larger Q.
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_exec import load_ref  # noqa: E402

from pctrans_tpu.losses.contrast import (  # noqa: E402
    cosine_similarity_matrix,
    pairwise_mask_dice,
    reid_losses_one_image,
)


def _reference_losses(dec_mod, crit_mod, query, masks, indices):
    """Run the executed reference chain: items -> reid losses."""
    B, Q, C = query.shape
    tq = torch.from_numpy(query).permute(1, 0, 2)  # [Q, B, C]
    emb_dist = torch.stack([
        torch.cosine_similarity(torch.from_numpy(query[b]).unsqueeze(1),
                                torch.from_numpy(query[b]).unsqueeze(0),
                                dim=-1)
        for b in range(B)
    ])
    t_indices = [(torch.as_tensor(r), torch.as_tensor(c)) for r, c in indices]
    items_q = dec_mod.select_pos_neg_query(tq, emb_dist, t_indices)
    items_m = dec_mod.select_pos_neg_mask(torch.from_numpy(masks), emb_dist,
                                          t_indices)
    self_stub = types.SimpleNamespace()
    lq = crit_mod.SetCriterion.loss_reid_query(
        self_stub, {"pred_qd_query": items_q}, None, None, None)
    lm = crit_mod.SetCriterion.loss_reid_mask(
        self_stub, {"pred_qd_mask": items_m}, None, None, None)
    return (float(lq["loss_reid_query"]), float(lq["loss_reid_query_aux"]),
            float(lm["loss_reid_mask"]), len(items_q))


def _my_losses(query, masks, indices, G):
    B = query.shape[0]
    cq = aq = cm = n = 0.0
    for b in range(B):
        rows, cols = indices[b]
        query4gt = np.zeros(G, np.int32)
        valid = np.zeros(G, bool)
        query4gt[np.asarray(cols)] = np.asarray(rows)
        valid[np.asarray(cols)] = True
        emb = jnp.asarray(cosine_similarity_matrix(jnp.asarray(query[b])))
        dice = pairwise_mask_dice(jnp.asarray(masks[b]))
        a, b_, c, k = reid_losses_one_image(
            jax.random.key(0), jnp.asarray(query[b]), emb, dice,
            jnp.asarray(query4gt), jnp.asarray(valid))
        cq += float(a)
        aq += float(b_)
        cm += float(c)
        n += float(k)
    return cq / max(n, 1), aq / max(n, 1), cm / max(n, 1), int(n)


@pytest.mark.parametrize("Q,G_match", [(8, 3), (24, 5)])
def test_reid_losses_match_executed_reference(rng, Q, G_match):
    dec_mod = load_ref("connectomics.model.maskformer_block."
                       "transformer_decoder.mask2former_transformer_decoder")
    crit_mod = load_ref("connectomics.model.loss.maskformer_criterion")
    B, C, h, w = 2, 16, 10, 8
    query = rng.randn(B, Q, C).astype(np.float32)
    masks = rng.randn(B, Q, h, w).astype(np.float32)
    indices = []
    for b in range(B):
        rows = np.sort(rng.choice(Q, size=G_match, replace=False))
        cols = rng.permutation(G_match)
        indices.append((rows, cols))

    ref_cq, ref_aq, ref_cm, ref_n = _reference_losses(
        dec_mod, crit_mod, query, masks, indices)
    my_cq, my_aq, my_cm, my_n = _my_losses(query, masks, indices, G=G_match)

    assert my_n == ref_n  # same active item count (empty clusters skipped)
    np.testing.assert_allclose(my_cq, ref_cq, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(my_cm, ref_cm, rtol=2e-4, atol=1e-5)
    if Q == 8:
        # the no-subsample regime: the aux cosine term is deterministic
        np.testing.assert_allclose(my_aq, ref_aq, rtol=2e-4, atol=1e-5)
