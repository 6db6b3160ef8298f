"""SetCriterion: the full PCTrans loss stack, in-jit with padded shapes.

Reference: connectomics/model/loss/maskformer_criterion.py:118-506 plus the
loss-weight dictionary assembled in arch/maskformer.py:97-136.  Losses:

* ``masks`` (sigmoid-CE + dice at ``num_points`` importance-sampled points,
  PointRend-style) for the final prediction and each of the 9 auxiliary
  layer outputs (deep supervision);
* ``refpoints`` — L1 between matched queries' refined reference points and
  GT instance centers, for the final layer and aux layers 1..8;
* ``reid_query`` / ``reid_mask`` — query-contrast losses (final layer only);
* ``sem`` — focal loss on a subsampled foreground map.  NOTE: the published
  reference subsamples the target at stride 8 while its semantic logits are
  stride 4 (maskformer_criterion.py:412 vs msdeformattn.py:360), which does
  not broadcast — an as-published crash.  We subsample at the logits' actual
  stride, preserving the intent;
* ``embedding`` — discriminative push-pull loss on the pixel embedding.

``num_masks`` normalization: the reference all-reduces the GT instance count
across ranks and divides by world size (criterion.py:464-470); under a jit
program with a batch-sharded mesh the global sum falls out of ``jnp.sum``
directly and the gradient is identical.

Matching runs for all 10 per-layer mask predictions as one vmapped in-jit
pass (the reference calls scipy on the CPU per layer inside the model
forward, mask2former_transformer_decoder.py:548,603).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.point_sample import (
    get_uncertain_point_coords,
    grid_sample_bilinear,
    kth_largest_threshold,
    point_sample,
    sample_label_onehot,
    sample_label_onehot_grid,
    uncertain_point_weights,
)
from .contrast import cosine_similarity_matrix, pairwise_mask_dice, reid_losses_one_image
from .discriminative import discriminative_loss
from .matcher import dense_matcher_indices, point_matcher_indices


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    refpoints_weight: float = 5.0
    reid_query_weight: float = 2.0
    reid_mask_weight: float = 2.0
    sem_weight: float = 5.0
    emb_weight: float = 2.0
    sem_loss_on: bool = True
    dec_layers: int = 10  # total mask predictions (9 decoder layers + 1)
    # dtype of the point-sampling contractions (the criterion's dominant
    # cost: ~260 ms of a 281 ms train step in f32 at the 448^2 recipe).  The
    # reference trains under AMP (engine/trainer.py:140); bf16 here halves
    # the MXU time of the matcher costs and the CE/dice point sampling while
    # all loss reductions stay f32.  Set "float32" for bit-level oracles.
    sample_dtype: str = "bfloat16"
    # The per-mask CE/dice targets are bilinearly point-sampled from the GT
    # instance masks; at the reference's full input resolution (448^2) that
    # sampling costs 4x the (stride-4) prediction sampling.  False (default)
    # samples a 2x-strided view — targets differ only sub-pixel at instance
    # boundaries.  True reproduces the reference's full-resolution targets.
    exact_targets: bool = False
    # How PointRend importance sampling picks its points:
    #   "dense" (default): no sampling at all — losses and matcher costs are
    #     evaluated at EVERY pixel of the stride-4 logits' own grid, with the
    #     PointRend importance weighting applied per pixel (selected-quantile
    #     mass + uniform fill, exactly the "shared" estimator with the
    #     candidate set = the grid).  At the trained recipes h*w ~
    #     TRAIN_NUM_POINTS (448^2/16 = 12544 = the configured num_points), so
    #     this is the ZERO-VARIANCE member of the same estimator family at
    #     the same evaluation count — and it deletes the per-layer bilinear
    #     sampling contractions (measured 16.4 ms of the 102 ms train step)
    #     because predictions are read directly and the GT one-hots reduce
    #     to 4 corner gathers done once per step, shared across all layers.
    #     Deterministic given the match.
    #   "shared": one candidate set per image per layer, shared
    #     across masks (the reference matcher already shares its points
    #     across all masks, matcher.py:116), with selection folded into
    #     per-mask per-point weights (sort-free threshold).  GT values come
    #     EXACTLY from the full-resolution integer label map
    #     (sample_label_onehot — no stride-2 target approximation), and all
    #     G mask logits are sampled by one C=G-wide hat contraction instead
    #     of G C=1 passes (~10x fewer sampling FLOPs).
    #   "weighted": per-mask candidates, selection as weights (sort-free).
    #   "topk": reference data flow, select-then-gather via approx_max_k.
    #   "exact": bit-exact torch.topk semantics (oracle comparisons).
    point_select: str = "dense"
    # Candidate-set size for the "shared" path, as a multiple of num_points.
    # The reference evaluates its loss at num_points positions whose density
    # is 3x higher (oversample_ratio) inside the most-uncertain quantile;
    # the weighted estimator reproduces that EXACTLY in expectation at ANY
    # candidate count by importance weights w_sel = imp*num_points/n_sel,
    # w_rest = (1-imp)*num_points/(M-n_sel).  1.0 (default) evaluates at
    # num_points candidates — 3x less sampling traffic than materializing
    # the oversampled set, at slightly higher estimator variance (a ~3x
    # smaller actual sample of the uncertain region, upweighted); set 3.0
    # to match the reference's sample counts exactly.
    candidate_ratio: float = 1.0


def build_criterion(cfg) -> "SetCriterion":
    mf = cfg.MODEL.MASK_FORMER
    return SetCriterion(
        CriterionConfig(
            num_points=mf.TRAIN_NUM_POINTS,
            oversample_ratio=mf.OVERSAMPLE_RATIO,
            importance_sample_ratio=mf.IMPORTANCE_SAMPLE_RATIO,
            mask_weight=mf.MASK_WEIGHT,
            dice_weight=mf.DICE_WEIGHT,
            refpoints_weight=mf.REF_POINTS_WEIGHT,
            reid_query_weight=mf.REID_WEIGHT_QUERY,
            reid_mask_weight=mf.REID_WEIGHT_MASK,
            sem_weight=mf.SEM_WEIGHT,
            emb_weight=mf.EMB_WEIGHT,
            sem_loss_on=mf.SEMANTIC_LOSS_ON,
            dec_layers=mf.DEC_LAYERS,
            sample_dtype=mf.TPU_RECIPE.SAMPLE_DTYPE,
            exact_targets=mf.TPU_RECIPE.EXACT_TARGETS,
            point_select=mf.TPU_RECIPE.POINT_SELECT,
            candidate_ratio=mf.TPU_RECIPE.CANDIDATE_RATIO,
        )
    )


def _bce_logits(x, y):
    return jax.nn.softplus(-x) * y + jax.nn.softplus(x) * (1.0 - y)


def _weighted_point_losses(wp, logits, labels):
    """Per-mask weighted point sigmoid-CE + dice over the last (point) axis.
    ``wp`` sums to ~num_points per mask, making these the reference's
    point-mean CE and point-set dice in expectation."""
    denom = jnp.maximum(wp.sum(-1), 1.0)
    ce = (wp * _bce_logits(logits, labels)).sum(-1) / denom
    sig = jax.nn.sigmoid(logits)
    dice = 1.0 - (2.0 * (wp * sig * labels).sum(-1) + 1.0) / (
        (wp * sig).sum(-1) + (wp * labels).sum(-1) + 1.0)
    return ce, dice


class SetCriterion:
    def __init__(self, config: CriterionConfig):
        self.cfg = config

    # -------------------------------------------------------------- pieces
    def _layer_mask_losses_dense(self, pred, tgt_hw, q4g, valid, num_masks):
        """CE + dice evaluated densely on the logits' own grid with
        PointRend importance weights (CriterionConfig.point_select "dense").
        pred [B, Q, h, w]; tgt_hw [B, G, h*w] GT on the same grid."""
        c = self.cfg
        B, Q, h, w = pred.shape
        G = q4g.shape[1]
        P = h * w
        logits = jnp.take_along_axis(
            pred, q4g[:, :, None, None], axis=1
        ).reshape(B, G, P).astype(jnp.float32)

        # identical weighting scheme to the shared path: the top
        # (imp/oversample) uncertainty quantile of the candidate set (here:
        # the whole grid) carries the reference's imp*num_points selected
        # mass; every position carries the uniform-fill share.
        uncert = -jnp.abs(jax.lax.stop_gradient(logits))
        k_q = max(int(P * c.importance_sample_ratio / c.oversample_ratio), 1)
        t = kth_largest_threshold(uncert, k_q)
        sel = uncert >= t
        n_sel = sel.sum(-1, keepdims=True).astype(jnp.float32)
        w_sel = c.importance_sample_ratio * c.num_points / jnp.maximum(
            n_sel, 1.0)
        w_fill = (1.0 - c.importance_sample_ratio) * c.num_points / P
        wp = jax.lax.stop_gradient(jnp.where(sel, w_sel, 0.0) + w_fill)

        ce, dice = _weighted_point_losses(wp, logits, tgt_hw)
        v = valid.astype(jnp.float32)
        return (ce * v).sum() / num_masks, (dice * v).sum() / num_masks

    def _layer_mask_losses_shared(self, rng, pred, seg, q4g, valid, num_masks):
        """Point-sampled sigmoid-CE + dice, shared-candidate formulation
        (CriterionConfig.point_select doc).  pred [B, Q, h, w] stride-4
        logits; seg [B, H, W] full-res integer label map."""
        c = self.cfg
        sdt = jnp.dtype(c.sample_dtype)
        B, Q, h, w = pred.shape
        G = q4g.shape[1]
        P = int(c.num_points * c.candidate_ratio)
        src = jnp.take_along_axis(pred, q4g[:, :, None, None], axis=1)

        cu = jax.random.uniform(rng, (2, B, P))
        cx, cy = cu[0], cu[1]
        # all G matched masks sampled in one C=G-wide contraction; a small
        # chunk keeps the vmap-over-layers hat tensors VMEM-resident
        logits = grid_sample_bilinear(
            src.astype(sdt), cx * w - 0.5, cy * h - 0.5, chunk=128,
        ).astype(jnp.float32)                                   # [B, G, P]

        # per-mask importance weights from the sampled logits themselves
        # (detectron2 computes uncertainty on the same oversampled logits):
        # points inside the top-(imp/oversample) uncertainty quantile carry
        # the reference's imp*N selected mass, and every candidate carries a
        # (1-imp)*N/P share of the reference's FRESH-UNIFORM fill — which is
        # uniform over the WHOLE domain, so it must land on selected points
        # too (restricting it to the complement under-weights the uncertain
        # region by (1-imp)*|U| ~ 6% of the total mass).
        uncert = -jnp.abs(jax.lax.stop_gradient(logits))
        k_q = max(int(P * c.importance_sample_ratio / c.oversample_ratio), 1)
        t = kth_largest_threshold(uncert, k_q)
        sel = uncert >= t
        n_sel = sel.sum(-1, keepdims=True).astype(jnp.float32)
        w_sel = c.importance_sample_ratio * c.num_points / jnp.maximum(
            n_sel, 1.0)
        w_fill = (1.0 - c.importance_sample_ratio) * c.num_points / P
        wp = jax.lax.stop_gradient(
            jnp.where(sel, w_sel, 0.0) + w_fill)               # [B, G, P]

        # exact full-resolution GT: 4 corner gathers through the label map
        coords = jnp.stack([cx, cy], axis=-1)                   # [B, P, 2]
        labels = jax.lax.stop_gradient(sample_label_onehot(seg, coords, G))

        ce, dice = _weighted_point_losses(wp, logits, labels)
        v = valid.astype(jnp.float32)
        return (ce * v).sum() / num_masks, (dice * v).sum() / num_masks

    def _layer_mask_losses(self, rng, pred, tgt_masks, q4g, valid, num_masks):
        """Point-sampled sigmoid-CE + dice for one prediction layer
        (maskformer_criterion.py:216-285)."""
        c = self.cfg
        sdt = jnp.dtype(c.sample_dtype)
        B, Q, h, w = pred.shape
        G = q4g.shape[1]
        src = jnp.take_along_axis(pred, q4g[:, :, None, None], axis=1)  # [B, G, h, w]
        src = src.reshape(B * G, 1, h, w).astype(sdt)
        tgt = tgt_masks.reshape(B * G, 1, *tgt_masks.shape[2:]).astype(sdt)

        # Uncertainty is only a RANKING over stop_gradient logits used to
        # pick sample positions; estimating it on a 2x-strided view of the
        # mask quarters the oversampled-sampling FLOPs (normalized coords are
        # resolution-independent, so the picked points transfer exactly).
        src_est = jax.lax.stop_gradient(src)[:, :, ::2, ::2]
        vmask = valid.reshape(-1).astype(jnp.float32)
        if c.point_select == "weighted":
            # selection as per-candidate weights: no top-k sort, no
            # coordinate gathers (see CriterionConfig.point_select)
            cx, cy, wp = uncertain_point_weights(
                rng, src_est, c.num_points,
                c.oversample_ratio, c.importance_sample_ratio)
            th, tw = tgt.shape[-2:]
            labels = jax.lax.stop_gradient(grid_sample_bilinear(
                tgt, cx * tw - 0.5, cy * th - 0.5)[:, 0]).astype(jnp.float32)
            sh, sw = src.shape[-2:]
            logits = grid_sample_bilinear(
                src, cx * sw - 0.5, cy * sh - 0.5)[:, 0].astype(jnp.float32)
            ce, dice = _weighted_point_losses(wp, logits, labels)
        else:
            coords = get_uncertain_point_coords(
                rng, src_est, c.num_points,
                c.oversample_ratio, c.importance_sample_ratio,
                exact_topk=c.point_select == "exact",
            )
            labels = jax.lax.stop_gradient(
                point_sample(tgt, coords)[:, 0]).astype(jnp.float32)
            logits = point_sample(src, coords)[:, 0].astype(jnp.float32)
            ce = _bce_logits(logits, labels).mean(axis=1)
            sig = jax.nn.sigmoid(logits)
            dice = 1.0 - (2.0 * (sig * labels).sum(1) + 1.0) / (
                sig.sum(1) + labels.sum(1) + 1.0)
        return (ce * vmask).sum() / num_masks, (dice * vmask).sum() / num_masks

    def _refpoints_loss(self, coords, centers, q4g, valid, num_masks):
        """L1 on matched reference points (maskformer_criterion.py:385-400)."""
        src = jnp.take_along_axis(coords, q4g[:, :, None], axis=1)       # [B, G, 2]
        l1 = jnp.abs(src - centers).sum(-1)
        return (l1 * valid).sum() / num_masks

    def _sem_loss(self, sem_logits, fg):
        """Focal loss on the subsampled FG map (maskformer_criterion.py:402-426)."""
        B, Hs, Ws, _ = sem_logits.shape
        H = fg.shape[1]
        stride = H // Hs
        tgt = fg[:, stride // 2 :: stride, stride // 2 :: stride][..., None]
        tgt = jax.lax.stop_gradient(tgt.astype(sem_logits.dtype))
        num_pos = jnp.maximum((tgt > 0).sum().astype(sem_logits.dtype), 1.0)
        p = jax.nn.sigmoid(sem_logits)
        ce = _bce_logits(sem_logits, tgt)
        p_t = p * tgt + (1 - p) * (1 - tgt)
        alpha_t = 0.25 * tgt + 0.75 * (1 - tgt)
        focal = alpha_t * ce * (1 - p_t) ** 2
        return focal.sum() / num_pos

    # -------------------------------------------------------------- forward
    def __call__(self, rng: jax.Array, outputs: Dict, targets: Dict):
        """Returns (total_weighted_loss, dict of raw per-loss scalars)."""
        c = self.cfg
        all_masks = outputs["aux_masks"] + [outputs["pred_masks"]]  # len L
        L = len(all_masks)
        assert L == c.dec_layers
        stacked = jnp.stack(all_masks)  # [L, B, Q, h, w]

        tgt_masks = targets["masks"]
        valid = targets["valid"]
        B, G = valid.shape

        k_match, k_points, k_reid = jax.random.split(rng, 3)
        match_keys = jax.random.split(k_match, L)
        # Matching is a discrete decision (reference matcher is @torch.no_grad);
        # stop_gradient keeps the LAP solver loops out of the backward graph.
        sdt = jnp.dtype(c.sample_dtype)
        stacked_ng = jax.lax.stop_gradient(stacked).astype(sdt)
        # GT-side sampling goes through the integer label map (exact; see
        # ops/point_sample.sample_label_onehot)
        seg = targets["seg"]
        tgt_dense = None
        if c.point_select == "dense":
            Q = stacked.shape[2]
            h, w = stacked.shape[-2:]
            # GT on the logits' grid, once per step, shared by all layers
            tgt_dense = jax.lax.stop_gradient(
                sample_label_onehot_grid(seg, (h, w), G).reshape(B, G, h * w))
            # ONE flat (B*L)-lane vmap instead of vmap-over-L of a
            # vmap-over-B: the JV solver is lane-parallel, and the measured
            # floor (tools_dev/opt_matcher.py: 1.5 ms for the full [20,
            # 100, 40] set) was taken at exactly this flat batching — the
            # nested form lays the while-loop state out as [10, 2, ...]
            # (2-wide minor tiles, T(2,128)) and profiles ~2.5 ms slower.
            # B stays the MAJOR factor of the merged axis: under a
            # batch-sharded mesh a (B, L) -> (B*L) merge keeps each
            # shard's rows contiguous, so sharding propagates; the L-major
            # merge forced an all-gather (caught by dryrun_multichip's
            # collective audit).
            indices = dense_matcher_indices(
                jnp.moveaxis(stacked_ng, 0, 1).reshape(B * L, Q, h, w),
                jnp.broadcast_to(tgt_dense[:, None],
                                 (B, L, G, h * w)).reshape(B * L, G, h * w),
                jnp.broadcast_to(valid[:, None], (B, L, G)).reshape(B * L, G),
                c.mask_weight, c.dice_weight,
            ).reshape(B, L, G).swapaxes(0, 1)  # [L, B, G]
        else:
            indices = jax.vmap(
                lambda k, p: point_matcher_indices(
                    k, p, seg, valid, c.num_points, c.mask_weight, c.dice_weight
                )
            )(match_keys, stacked_ng)  # [L, B, G]

        num_masks = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)

        losses: Dict[str, jnp.ndarray] = {}
        weights: Dict[str, float] = {}

        # All L predictions share one shape: vmap the point-sampled losses
        # over the layer axis (one compiled graph instead of L copies).
        point_keys = jax.random.split(k_points, L)
        if c.point_select == "dense":
            lm, ld = jax.vmap(
                self._layer_mask_losses_dense,
                in_axes=(0, None, 0, None, None)
            )(stacked, tgt_dense, indices, valid, num_masks)
        elif c.point_select == "shared":
            lm, ld = jax.vmap(
                self._layer_mask_losses_shared,
                in_axes=(0, 0, None, 0, None, None)
            )(point_keys, stacked, seg, indices, valid, num_masks)
        else:
            tgt_for_loss = (tgt_masks if c.exact_targets
                            else tgt_masks[:, :, ::2, ::2])
            lm, ld = jax.vmap(
                self._layer_mask_losses, in_axes=(0, 0, None, 0, None, None)
            )(point_keys, stacked, tgt_for_loss, indices, valid, num_masks)
        for l in range(L):
            mk, dk = ("loss_mask", "loss_dice") if l == L - 1 else (
                f"loss_mask_{l}", f"loss_dice_{l}")
            losses[mk], losses[dk] = lm[l], ld[l]
            weights[mk], weights[dk] = c.mask_weight, c.dice_weight

        # refpoints: aux layers 1..L-2 use layer-(i-1) coords with layer-i
        # indices (maskformer_criterion.py:501-504); final layer uses the
        # final coords with the final indices.
        centers = targets["center_points"]
        coords_stack = jnp.stack(
            list(outputs["aux_reference_points"]) + [outputs["reference_points"]]
        )  # [L-1, B, Q, 2], paired with indices[1:]
        rp = jax.vmap(self._refpoints_loss, in_axes=(0, None, 0, None, None))(
            coords_stack, centers, indices[1:], valid, num_masks
        )
        for i in range(1, L - 1):
            losses[f"loss_refpoints_{i}"] = rp[i - 1]
            weights[f"loss_refpoints_{i}"] = c.refpoints_weight
        losses["loss_refpoints"] = rp[-1]
        weights["loss_refpoints"] = c.refpoints_weight

        # query contrast (final layer only)
        query = outputs["query_emb"]
        emb_dist = jax.vmap(cosine_similarity_matrix)(query)
        mask_dice = jax.vmap(pairwise_mask_dice)(outputs["pred_masks"])
        reid_keys = jax.random.split(k_reid, B)
        cq, aq, cm, n_items = jax.vmap(reid_losses_one_image)(
            reid_keys, query, emb_dist, mask_dice, indices[-1], valid
        )
        denom = jnp.maximum(n_items.sum().astype(jnp.float32), 1.0)
        losses["loss_reid_query"] = cq.sum() / denom
        losses["loss_reid_query_aux"] = aq.sum() / denom
        losses["loss_reid_mask"] = cm.sum() / denom
        weights["loss_reid_query"] = c.reid_query_weight
        weights["loss_reid_query_aux"] = c.reid_query_weight * 1.5
        weights["loss_reid_mask"] = c.reid_mask_weight

        if c.sem_loss_on and outputs.get("sem_mask") is not None:
            losses["loss_sem"] = self._sem_loss(outputs["sem_mask"], targets["fg_mask"])
            weights["loss_sem"] = c.sem_weight

        losses["loss_emb"] = discriminative_loss(
            outputs["mask_features"], targets["seg"], G
        )
        weights["loss_emb"] = c.emb_weight

        total = sum(losses[k] * weights[k] for k in losses)
        return total, losses
