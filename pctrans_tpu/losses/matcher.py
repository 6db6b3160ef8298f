"""Point-sampled Hungarian matcher, fully in-jit.

Semantics follow the reference ``Point_HungarianMatcher``
(connectomics/model/loss/matcher.py:70-165): per image, one shared set of
``num_points`` uniform-random points is sampled; prediction logits and GT
masks are bilinearly point-sampled at those coordinates; the cost is
``cost_mask * sigmoid-CE + cost_dice * dice`` and the assignment is solved
per image.  The reference moves the cost to the CPU and calls scipy once per
decoder layer per image (matcher.py:154-156) — ten host syncs per training
step; here the padded LAP solver (ops/lap.py) runs on device and is vmapped
over images and decoder layers.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.lap import match_padded
from ..ops.point_sample import point_sample, sample_label_onehot


def _pair_costs(out_pts: jnp.ndarray, tgt_pts: jnp.ndarray, cost_mask: float, cost_dice: float):
    """out_pts: [Q, P] logits; tgt_pts: [G, P] binary.  Returns [Q, G] f32 cost.

    The [Q, P] x [P, G] contractions run in the inputs' dtype (bf16 under the
    criterion's AMP-style sampling) with f32 accumulation; matching is a
    discrete argmin, so sub-1e-3 cost noise can only flip genuine near-ties
    (which the reference's scipy solver broke arbitrarily anyway)."""
    P = out_pts.shape[1]
    f32 = jnp.float32
    pos = jax.nn.softplus(-out_pts)   # BCE(out, 1)
    neg = jax.nn.softplus(out_pts)    # BCE(out, 0)
    ce = (jnp.matmul(pos, tgt_pts.T, preferred_element_type=f32)
          + jnp.matmul(neg, (1.0 - tgt_pts).T, preferred_element_type=f32)) / P

    sig = jax.nn.sigmoid(out_pts)
    numer = 2.0 * jnp.matmul(sig, tgt_pts.T, preferred_element_type=f32)
    denom = (sig.astype(f32).sum(-1)[:, None]
             + tgt_pts.astype(f32).sum(-1)[None, :])
    dice = 1.0 - (numer + 1.0) / (denom + 1.0)
    return (cost_mask * ce + cost_dice * dice).astype(f32)


def match_one_image(
    key: jax.Array,
    pred_logits: jnp.ndarray,   # [Q, h, w]
    gt_seg: jnp.ndarray,        # [H, W] int32 label map (0 = bg, ids 1..G)
    valid: jnp.ndarray,         # [G] bool
    num_points: int,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> jnp.ndarray:
    """Returns query4gt int32 [G] (meaningful where ``valid``)."""
    G = valid.shape[0]
    coords = jax.random.uniform(key, (1, num_points, 2))
    # the points are shared across masks, so sample all Q masks as channels
    # of one contraction — on the MXU this is N=Q wide instead of Q separate
    # N=1 dots (Point_HungarianMatcher semantics, matcher.py:116)
    out_pts = point_sample(pred_logits[None], coords)[0]   # [Q, P]
    # GT masks factor exactly through the integer label map: 4 corner
    # gathers + id compares, independent of the (full-res) map size — vs a
    # hat generator costing H*W ops per point (ops/point_sample.py
    # sample_label_onehot)
    tgt_pts = sample_label_onehot(gt_seg[None], coords, G)[0]  # [G, P]
    cost = _pair_costs(out_pts, tgt_pts.astype(pred_logits.dtype),
                       cost_mask, cost_dice)
    return match_padded(cost, valid)


def dense_matcher_indices(
    pred_logits: jnp.ndarray,   # [B, Q, h, w]
    tgt_dense: jnp.ndarray,     # [B, G, h*w] GT masks on the pred grid
    valid: jnp.ndarray,         # [B, G]
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> jnp.ndarray:
    """Matching with costs evaluated DENSELY on the prediction's own grid.

    The reference matcher Monte-Carlo-estimates its CE/dice costs at
    ``num_points`` uniform points (matcher.py:116-129); at the trained
    recipe the stride-4 logits hold h*w ~ num_points pixels, so the dense
    evaluation is the zero-variance version of the same estimator at the
    same FLOP count — minus all sampling machinery (see
    CriterionConfig.point_select "dense").  Deterministic (no RNG).
    Returns query4gt int32 [B, G].
    """
    B, Q, h, w = pred_logits.shape
    out = pred_logits.reshape(B, Q, h * w)

    def one(o, t, v):
        cost = _pair_costs(o, t.astype(o.dtype), cost_mask, cost_dice)
        return match_padded(cost, v)

    return jax.vmap(one)(out, tgt_dense, valid)


@partial(jax.jit, static_argnums=(4, 5, 6))
def point_matcher_indices(
    key: jax.Array,
    pred_logits: jnp.ndarray,   # [B, Q, h, w]
    gt_seg: jnp.ndarray,        # [B, H, W] int32 label map
    valid: jnp.ndarray,         # [B, G]
    num_points: int,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> jnp.ndarray:
    """Batched matching: returns query4gt int32 [B, G]."""
    B = pred_logits.shape[0]
    keys = jax.random.split(key, B)
    fn = partial(match_one_image, num_points=num_points,
                 cost_mask=cost_mask, cost_dice=cost_dice)
    return jax.vmap(fn)(keys, pred_logits, gt_seg, valid)
