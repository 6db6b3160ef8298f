"""Discriminative (push-pull) embedding loss on pixel embeddings.

Matches the reference ``discriminative_loss`` (connectomics/model/loss/
loss.py:297-355; called from ``loss_embedding``,
maskformer_criterion.py:288-316): per image, pull pixel embeddings toward
their instance centroid ((||e - mu|| - delta_v)^2, *without* relu — the
reference's relu variant is commented out), push centroids of different
instances apart (relu(delta_d - dist)^2), plus a small centroid-norm
regularizer.  The instance map is the GT label map nearest-downsampled to
the embedding resolution; because instances are disjoint this equals the
reference's per-mask argmax construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize_nearest_torch


def discriminative_loss(
    emb: jnp.ndarray,       # [B, h, w, C]
    seg: jnp.ndarray,       # [B, H, W] int32 instance ids (0 = background)
    max_instances: int,
    delta_v: float = 0.5,
    delta_d: float = 3.0,
    alpha: float = 1.0,
    beta: float = 1.0,
    gamma: float = 0.001,
) -> jnp.ndarray:
    B, h, w, C = emb.shape
    G = max_instances
    seg_small = resize_nearest_torch(seg, (h, w))       # [B, h, w]

    def per_image(e, s):
        e = e.reshape(h * w, C)
        s = s.reshape(h * w)
        onehot = (s[None, :] == jnp.arange(1, G + 1)[:, None]).astype(e.dtype)  # [G, hw]
        cnt = onehot.sum(axis=1)
        present = cnt > 0
        num_id = present.sum().astype(e.dtype)
        safe_cnt = jnp.maximum(cnt, 1.0)
        mu = (onehot @ e) / safe_cnt[:, None]           # [G, C]

        # var (pull): mean over each instance's pixels of (||e - mu|| - dv)^2
        # NB: eps-guarded sqrt, NOT jnp.linalg.norm — a single-pixel instance
        # has e == mu exactly and d/dx ||x|| at 0 is NaN, which poisons every
        # gradient (round-1 failure: all params NaN after one step).
        mu_pix = mu[jnp.clip(s - 1, 0, G - 1)]          # [hw, C]
        d = jnp.sqrt(jnp.maximum(((e - mu_pix) ** 2).sum(axis=1), 1e-12))
        per_pix = (d - delta_v) ** 2
        per_inst = (onehot @ per_pix) / safe_cnt
        var_loss = jnp.where(num_id > 0, (per_inst * present).sum() / jnp.maximum(num_id, 1.0), 0.0)

        # dist (push): pairwise centroid distances among present instances
        diff = mu[:, None, :] - mu[None, :, :]
        dist = jnp.sqrt(jnp.maximum((diff**2).sum(-1), 1e-12))
        dist = dist + jnp.eye(G, dtype=e.dtype) * delta_d
        pair_ok = present[:, None] & present[None, :]
        hinge = jnp.where(pair_ok, jax.nn.relu(delta_d - dist) ** 2, 0.0)
        denom = num_id * (num_id - 1.0)
        dist_loss = jnp.where(num_id > 1, hinge.sum() / jnp.maximum(denom, 1.0) / 2.0, 0.0)

        # reg: mean centroid norm over present instances (eps-guarded: absent
        # slots have mu == 0 and the norm gradient at 0 is NaN; NaN * 0 stays
        # NaN in the backward pass)
        norms = jnp.sqrt(jnp.maximum((mu**2).sum(axis=1), 1e-12)) * present
        reg_loss = jnp.where(num_id > 0, norms.sum() / jnp.maximum(num_id, 1.0), 0.0)
        return var_loss, dist_loss, reg_loss

    v, di, r = jax.vmap(per_image)(emb, seg_small)
    return alpha * v.mean() + beta * di.mean() + gamma * r.mean()
