"""Query-contrast (re-id) losses with fixed shapes.

Reimplements the reference's per-item Python loops
(``select_pos_neg_query`` / ``select_pos_neg_mask``,
mask2former_transformer_decoder.py:800-900, consumed by
``loss_reid_query`` / ``loss_reid_mask``, maskformer_criterion.py:318-383)
as masked batched ops:

* for every *matched* query (one per valid GT slot), its "cluster" is the set
  of unmatched queries whose cosine-similarity argmax over matched queries
  lands on it;
* items with an empty cluster are skipped (they do not count toward the
  mean);
* contrastive loss per item: logsumexp over all (neg - pos) logit pairs plus
  a zero pad — computed here in closed form as
  ``log(1 + sum_n exp(c_n/T) * sum_p exp(-c_p/T))``;
* the auxiliary cosine-regression term samples ``min(10*|pos|, |neg|)``
  negatives uniformly without replacement (the reference uses Python
  ``random.sample``; here an explicit PRNG ranking, which also makes the
  loss reproducible).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


def _masked_lse(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """logsumexp over masked entries; empty mask -> -inf-ish (exp -> 0)."""
    z = jnp.where(mask, x, _NEG_BIG)
    m = jnp.max(z, axis=axis, keepdims=True)
    m = jnp.maximum(m, _NEG_BIG)  # guard all-masked rows
    s = jnp.sum(jnp.where(mask, jnp.exp(z - m), 0.0), axis=axis)
    return jnp.squeeze(m, axis) + jnp.log(jnp.maximum(s, 1e-30))


def _clusters(
    emb_dist: jnp.ndarray,   # [Q, Q] cosine similarity
    query4gt: jnp.ndarray,   # [G]
    valid: jnp.ndarray,      # [G]
):
    """Cluster assignment of unmatched queries to matched ones.

    Returns (pos_mask [G, Q], neg_mask [G, Q], active [G]).
    """
    Q = emb_dist.shape[0]
    G = query4gt.shape[0]
    qids = jnp.arange(Q)

    matched = jnp.any((qids[:, None] == query4gt[None, :]) & valid[None, :], axis=1)

    # similarity of every query to each matched query (invalid slots -> -inf)
    sim = emb_dist[:, query4gt]                        # [Q, G]
    sim = jnp.where(valid[None, :], sim, _NEG_BIG)
    nearest = jnp.argmax(sim, axis=1)                  # [Q] in [0, G)

    pos_mask = (~matched)[None, :] & (nearest[None, :] == jnp.arange(G)[:, None]) & valid[:, None]
    key_onehot = qids[None, :] == query4gt[:, None]    # [G, Q]
    neg_mask = (~pos_mask) & (~key_onehot) & valid[:, None]
    active = valid & (pos_mask.sum(axis=1) > 0)
    return pos_mask, neg_mask, active


def reid_losses_one_image(
    rng: jax.Array,
    query: jnp.ndarray,      # [Q, C] final decoder output (pre-norm)
    emb_dist: jnp.ndarray,   # [Q, Q] cosine similarity
    mask_dice: jnp.ndarray,  # [Q, Q] pairwise dice of sigmoided masks
    query4gt: jnp.ndarray,   # [G]
    valid: jnp.ndarray,      # [G]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image sums: (contrast_q, aux_q, contrast_m, n_items)."""
    Q = query.shape[0]
    G = query4gt.shape[0]
    pos_mask, neg_mask, active = _clusters(emb_dist, query4gt, valid)

    # raw dot products against each item's key query: [G, Q] — contract the
    # G key rows directly instead of the full [Q, Q] gram (G << Q; only the
    # query4gt rows are consumed).
    # (HIGHEST: on TPU the default matmul precision is bf16; the contrastive
    # logits feed a logsumexp and need full f32.)
    c = jnp.matmul(query[query4gt], query.T,
                   precision=jax.lax.Precision.HIGHEST)  # [G, Q]
    pred = c / 2.0
    lse_neg = _masked_lse(pred, neg_mask)               # [G]
    lse_pos = _masked_lse(-pred, pos_mask)
    contrast_q = jnp.where(active, jnp.logaddexp(0.0, lse_neg + lse_pos), 0.0)

    # aux cosine regression with sampled negatives
    n_pos = pos_mask.sum(axis=1)
    n_neg = neg_mask.sum(axis=1)
    n_samp = jnp.minimum(10 * n_pos, n_neg)
    r = jax.random.uniform(rng, (G, Q))
    score = jnp.where(neg_mask, r, jnp.inf)
    rank = jnp.argsort(jnp.argsort(score, axis=1), axis=1)
    sel = neg_mask & (rank < n_samp[:, None])
    cos = emb_dist[query4gt]                            # [G, Q]
    sq_err = jnp.where(pos_mask, (cos - 1.0) ** 2, 0.0) + jnp.where(sel, cos**2, 0.0)
    denom = jnp.maximum(n_pos + n_samp, 1)
    aux_q = jnp.where(active, sq_err.sum(axis=1) / denom, 0.0)

    # mask-dice contrast
    dm = mask_dice[query4gt] / 0.5                      # [G, Q]
    lse_neg_m = _masked_lse(dm, neg_mask)
    lse_pos_m = _masked_lse(-dm, pos_mask)
    contrast_m = jnp.where(active, jnp.logaddexp(0.0, lse_neg_m + lse_pos_m), 0.0)

    return contrast_q.sum(), aux_q.sum(), contrast_m.sum(), active.sum()


def pairwise_mask_dice(mask_logits: jnp.ndarray) -> jnp.ndarray:
    """dice[i, j] of sigmoided flattened masks [Q, h, w]
    (reference ``dice_for``, mask2former_transformer_decoder.py:917-927)."""
    Q = mask_logits.shape[0]
    # f32 regardless of the model compute dtype: the denominators are pixel
    # counts up to h*w (~12.5k), where bf16 resolution is ~64
    s = jax.nn.sigmoid(mask_logits.reshape(Q, -1).astype(jnp.float32))
    numer = jnp.matmul(s, s.T, precision=jax.lax.Precision.HIGHEST)
    sums = s.sum(axis=1)
    denom = sums[:, None] + sums[None, :]
    return (2.0 * numer + 1.0) / (denom + 1.0)


def cosine_similarity_matrix(query: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise cosine similarity of [Q, C] embeddings, torch semantics."""
    norms = jnp.linalg.norm(query, axis=-1)
    denom = jnp.maximum(norms[:, None] * norms[None, :], eps)
    gram = jnp.matmul(query, query.T, precision=jax.lax.Precision.HIGHEST)
    return gram / denom
