"""Bilinear point sampling with torch ``grid_sample`` semantics.

The reference's mask losses and matcher sample mask logits at normalized
point coordinates through detectron2 PointRend's ``point_sample`` (reference:
connectomics/model/loss/maskformer_criterion.py:248-275, matcher.py:116-129),
which is ``F.grid_sample(..., mode='bilinear', padding_mode='zeros',
align_corners=False)`` on ``grid = 2*coords - 1``.  We reimplement exactly
those semantics: for an axis of size ``S`` and normalized coordinate ``t`` in
[0, 1], the continuous pixel position is ``t*S - 0.5``; out-of-bounds corners
contribute zero.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def grid_sample_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                         chunk: int = 1024) -> jnp.ndarray:
    """Sample ``img`` [B, C, H, W] at continuous pixel coords (x, y) [B, P].

    Returns [B, C, P]; out-of-bounds contributions are zero
    (padding_mode='zeros').

    TPU formulation: bilinear sampling is the rank-1 hat product
    ``hat(y - sy) img[sy, sx] hat(x - sx)``, ``hat(t) = max(0, 1 - |t|)`` —
    dense contractions per chunk of points instead of 4 row-serial gathers
    (XLA TPU gathers cost ~4ns/row; the training criterion samples O(10^8)
    points per step, which made point sampling the dominant train cost, and
    its scatter-add backward is worse).  The hat product is bit-equal to the
    corner formulation in-range and zero outside; gradients are matmuls.

    Two contraction orders, chosen by channel count (MXU wants a wide N):
    * C small (per-mask sampling, C=1): two-stage separable —
      ``A[p, c, sx] = sum_sy hy[p, sy] img[c, sy, sx]`` (matmul, N = C*W)
      then a cheap VPU reduce over sx.  A fused single dot would have
      N = C = 1, wasting 128x of the systolic array.
    * C large (shared coords across masks, e.g. the matcher's Q/G masks):
      fused generator ``W[p, (sy sx)] = hy*hx`` contracted against
      ``img[(sy sx), c]`` (N = C); the two-stage A would be C*W wide and
      blow memory.
    """
    B, C, H, W = img.shape
    P = x.shape[1]
    cdt = jnp.promote_types(img.dtype, jnp.float32)

    CH = max(1, min(chunk, P))
    nch = -(-P // CH)
    Pp = nch * CH
    x = x.astype(cdt)
    y = y.astype(cdt)
    if Pp != P:  # pad with far-out-of-range coords -> zero hats
        x = jnp.pad(x, ((0, 0), (0, Pp - P)), constant_values=-2.0)
        y = jnp.pad(y, ((0, 0), (0, Pp - P)), constant_values=-2.0)
    xch = x.reshape(B, nch, CH).transpose(1, 0, 2)
    ych = y.reshape(B, nch, CH).transpose(1, 0, 2)
    sy = jnp.arange(H, dtype=cdt)
    sx = jnp.arange(W, dtype=cdt)

    # checkpoint the bodies: without it, AD saves the per-chunk hat tensors
    # as scan residuals (O(10) GB at criterion shapes); recomputing them from
    # the tiny coords is nearly free.
    @jax.checkpoint
    def body_separable(carry, xs):
        xc, yc = xs                                       # [B, CH]
        hy = jax.nn.relu(1.0 - jnp.abs(yc[..., None] - sy))   # [B, CH, H]
        hx = jax.nn.relu(1.0 - jnp.abs(xc[..., None] - sx))   # [B, CH, W]
        a = jax.lax.dot_general(                          # [B, CH, C, W]
            hy.astype(img.dtype), img,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=cdt,
        )
        o = jnp.einsum("bpcw,bpw->bpc", a, hx.astype(cdt))
        return carry, o                                   # [B, CH, C]

    @jax.checkpoint
    def body_generator(carry, xs):
        xc, yc = xs
        hy = jax.nn.relu(1.0 - jnp.abs(yc[..., None] - sy))
        hx = jax.nn.relu(1.0 - jnp.abs(xc[..., None] - sx))
        wm = (hy[..., :, None] * hx[..., None, :]).astype(img.dtype)
        o = jax.lax.dot_general(
            wm, img,
            dimension_numbers=(((2, 3), (2, 3)), ((0,), (0,))),
            preferred_element_type=cdt,
        )
        return carry, o                                   # [B, CH, C]

    body = body_separable if C <= 8 else body_generator
    _, ys = jax.lax.scan(body, None, (xch, ych))
    out = jnp.transpose(ys, (1, 0, 2, 3)).reshape(B, Pp, C)[:, :P]
    return jnp.transpose(out, (0, 2, 1)).astype(img.dtype)


def grid_sample_bilinear_gather(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """4-corner gather formulation (semantics oracle for the hat path)."""
    B, C, H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(B, C, H * W)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)  # [B, P]
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # [B, C, P]
        return vals * (w * valid)[:, None, :]

    out = (
        corner(x0i, y0i, (1 - tx) * (1 - ty))
        + corner(x0i + 1, y0i, tx * (1 - ty))
        + corner(x0i, y0i + 1, (1 - tx) * ty)
        + corner(x0i + 1, y0i + 1, tx * ty)
    )
    return out


def point_sample(inputs: jnp.ndarray, point_coords: jnp.ndarray) -> jnp.ndarray:
    """PointRend ``point_sample`` with align_corners=False.

    ``inputs``: [B, C, H, W]; ``point_coords``: [B, P, 2] in [0, 1] with the
    last dim ordered (x, y).  Returns [B, C, P].
    """
    H, W = inputs.shape[-2:]
    x = point_coords[..., 0] * W - 0.5
    y = point_coords[..., 1] * H - 0.5
    return grid_sample_bilinear(inputs, x, y)


def get_uncertain_point_coords(
    rng: jax.Array,
    logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
    uncertainty_fn: Callable[[jnp.ndarray], jnp.ndarray] = lambda l: -jnp.abs(l),
    exact_topk: bool = False,
) -> jnp.ndarray:
    """PointRend importance sampling of point coordinates.

    Mirrors detectron2's ``get_uncertain_point_coords_with_randomness`` as
    used by the reference mask loss (maskformer_criterion.py:248-256):
    oversample uniformly, keep the ``importance_sample_ratio`` most uncertain
    points, fill the rest with fresh uniform points.

    The uncertain-point selection uses ``jax.lax.approx_max_k`` (the TPU
    hardware-accelerated partial sort) by default: exact ``top_k`` over the
    [N, 3*num_points] uncertainty matrix was the single largest cost of the
    training step (~144 ms of a 281 ms step at the 448^2 recipe — a full
    sort per mask), and a 0.95-recall approximate selection of an
    importance-*sampled* point set changes nothing statistically.  Pass
    ``exact_topk=True`` to reproduce torch.topk semantics bit-for-bit.

    ``logits``: [N, 1, H, W].  Returns [N, num_points, 2] in [0, 1], (x, y).
    """
    assert oversample_ratio >= 1
    N = logits.shape[0]
    H, W = logits.shape[-2:]
    num_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    # x/y as SEPARATE [N, P] planes: a materialized [N, P, 2] pair tensor
    # tiles each 2-wide row onto a (2, 128) TPU tile, and gathering along
    # the middle dim through that layout cost 167 ms/step at the 448^2
    # recipe (traced as one giant pad-amplified gather fusion)
    cu = jax.random.uniform(k1, (2, N, num_sampled))
    cx, cy = cu[0], cu[1]
    point_logits = grid_sample_bilinear(logits, cx * W - 0.5, cy * H - 0.5)
    uncert = uncertainty_fn(point_logits)[:, 0, :]       # [N, num_sampled]

    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    if exact_topk:
        _, idx = jax.lax.top_k(uncert, num_uncertain)    # [N, num_uncertain]
    else:
        # Bin-level approximate selection WITHOUT the aggregation top-k:
        # aggregate_to_topk=True appends a full sort over the binned
        # candidates ([L*N, 3*num_points] -> 47 ms/step at the 448^2
        # recipe); the per-bin winners are already high-uncertainty points,
        # and since the candidate coords are iid uniform, an even-strided
        # subset of bin winners is as unbiased as the sorted top-k.
        _, idx = jax.lax.approx_max_k(uncert, num_uncertain,
                                      recall_target=0.95,
                                      aggregate_to_topk=False)
        l = idx.shape[-1]
        if l > num_uncertain:  # even stride over bins, then trim
            idx = idx[:, :: max(l // num_uncertain, 1)][:, :num_uncertain]
    picked_x = jnp.take_along_axis(cx, idx, axis=1)      # [N, k] flat gathers
    picked_y = jnp.take_along_axis(cy, idx, axis=1)
    picked = jnp.stack([picked_x, picked_y], axis=-1)    # [N, k, 2] (small)
    if num_random > 0:
        rand_coords = jax.random.uniform(k2, (N, num_random, 2))
        picked = jnp.concatenate([picked, rand_coords], axis=1)
    return picked


def kth_largest_threshold(x: jnp.ndarray, k: int, iters: int = 14) -> jnp.ndarray:
    """Sort-free approximate k-th largest value along the last axis.

    Bisects the value range with count passes (each a fused compare+reduce —
    pure VPU bandwidth), returning the largest ``t`` found such that
    ``(x >= t).sum(-1) >= k``.  After ``iters`` halvings the threshold is
    within ``range/2^iters`` of exact, so the selected count deviates from
    ``k`` only across near-tied values — the right trade for importance
    *sampling*, where TPU-hostile top-k machinery (sort + 12M-element
    scalar gathers, 450 ms/step at the 448^2 recipe) buys nothing
    statistically.  Shape: x [..., P] -> t [..., 1].
    """
    lo = x.min(-1, keepdims=True)
    hi = x.max(-1, keepdims=True)
    for _ in range(iters):
        mid = (lo + hi) * 0.5
        enough = (x >= mid).sum(-1, keepdims=True) >= k
        lo = jnp.where(enough, mid, lo)
        hi = jnp.where(enough, hi, mid)
    return lo


def uncertain_point_weights(
    rng: jax.Array,
    logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
    uncertainty_fn: Callable[[jnp.ndarray], jnp.ndarray] = lambda l: -jnp.abs(l),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PointRend importance sampling as per-candidate WEIGHTS (TPU-native
    formulation of :func:`get_uncertain_point_coords`).

    Instead of selecting ``num_points`` of the ``oversample_ratio *
    num_points`` uniform candidates and gathering their coordinates (top-k
    sort + per-scalar index gathers — the two dominate the whole train
    step on TPU), keep ALL candidates and return a weight per candidate:
    the selected ``~importance_sample_ratio * num_points`` most uncertain
    (threshold from :func:`kth_largest_threshold`) carry the selected mass,
    and EVERY candidate carries a ``(1-imp)*num_points/P`` share of the
    reference's fresh-uniform fill — the fill is uniform over the whole
    domain, so its mass lands on the uncertain region too.  Downstream
    losses become weighted means over the candidate set — identical in
    expectation to the reference's select-then-average (the selected mass
    matches top-k exactly; candidates are iid uniform, so the per-candidate
    fill share is an unbiased estimator of the uniform integral), with no
    gather in the graph.

    ``logits``: [N, 1, H, W].  Returns (x, y, weights), each [N, P] with
    P = oversample_ratio * num_points; x/y in [0, 1].
    """
    assert oversample_ratio >= 1
    N = logits.shape[0]
    H, W = logits.shape[-2:]
    P = int(num_points * oversample_ratio)
    cu = jax.random.uniform(rng, (2, N, P))
    cx, cy = cu[0], cu[1]
    point_logits = grid_sample_bilinear(logits, cx * W - 0.5, cy * H - 0.5)
    uncert = uncertainty_fn(point_logits)[:, 0, :]        # [N, P]

    k_imp = int(importance_sample_ratio * num_points)
    t = kth_largest_threshold(uncert, k_imp)
    sel = uncert >= t                                     # ~k_imp per row
    n_sel = sel.sum(-1, keepdims=True).astype(jnp.float32)
    # selected mass k_imp (robust to ties) + uniform fill share everywhere
    w_sel = k_imp / jnp.maximum(n_sel, 1.0)
    w_fill = (num_points - k_imp) / P
    w = jnp.where(sel, w_sel, 0.0) + w_fill
    return cx, cy, jax.lax.stop_gradient(w)


@partial(jax.jit, static_argnums=(2,))
def sample_masks_at_points(masks: jnp.ndarray, coords: jnp.ndarray, squeeze: bool = True):
    """Convenience wrapper: masks [N, H, W] sampled at coords [N, P, 2] -> [N, P]."""
    out = point_sample(masks[:, None], coords)
    return out[:, 0] if squeeze else out


def sample_label_onehot(seg: jnp.ndarray, point_coords: jnp.ndarray,
                        num_ids: int) -> jnp.ndarray:
    """Point-sample all instances' one-hot masks through the integer label map.

    For coords SHARED across instances (the matcher's case,
    Point_HungarianMatcher matcher.py:116), bilinear sampling of instance
    g's binary mask factorizes exactly:

        sample(onehot_g)(p) = sum_c w_c(p) * [seg(corner_c(p)) == g]

    so instead of a hat contraction per instance over the full [H, W] map
    (~H*W FLOPs per point per the generator build), we gather the FOUR
    corner labels of each point once (4 * P rows) and compare against every
    id — exact, and independent of the map resolution.

    seg: [B, H, W] int (0 = background, ids 1..num_ids);
    point_coords: [B, P, 2] normalized (x, y), grid_sample align_corners=False.
    Returns [B, num_ids, P] float32, bit-equal to
    ``point_sample(onehot_masks, point_coords)``.
    """
    H, W = seg.shape[1:]
    x = point_coords[..., 0] * W - 0.5
    y = point_coords[..., 1] * H - 0.5
    return _label_onehot_at(seg, x, y, num_ids)


def _label_onehot_at(seg: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     num_ids: int) -> jnp.ndarray:
    B, H, W = seg.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(jnp.float32)
    ty = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = seg.reshape(B, H * W)
    ids = jnp.arange(1, num_ids + 1, dtype=seg.dtype)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)   # [B, P]
        vals = jnp.take_along_axis(flat, idx, axis=1)               # [B, P]
        onehot = vals[:, None, :] == ids[None, :, None]             # [B, G, P]
        return onehot.astype(jnp.float32) * (w * valid)[:, None, :]

    return (
        corner(x0i, y0i, (1 - tx) * (1 - ty))
        + corner(x0i + 1, y0i, tx * (1 - ty))
        + corner(x0i, y0i + 1, (1 - tx) * ty)
        + corner(x0i + 1, y0i + 1, tx * ty)
    )


def sample_label_onehot_grid(seg: jnp.ndarray, hw: Tuple[int, int],
                             num_ids: int) -> jnp.ndarray:
    """All instances' one-hot masks bilinearly sampled at the PIXEL CENTERS
    of an (h, w) grid — the dense-grid special case of
    :func:`sample_label_onehot` (same grid_sample align_corners=False
    semantics, coords x=(j+0.5)/w, y=(i+0.5)/h).

    This is the GT side of the criterion's ``dense`` point mode: the
    stride-4 mask logits have h*w ~ TRAIN_NUM_POINTS positions, so
    evaluating losses densely on their own grid replaces the per-layer
    random-point sampling contractions while the GT reduces to 4 corner
    gathers computed ONCE per step (shared by all decoder layers).

    seg: [B, H, W] int (0 = background).  Returns [B, num_ids, h, w] f32.
    """
    B, H, W = seg.shape
    h, w = hw
    if H % h == 0 and W % w == 0:
        # Integer stride ratio: every sample sits at x = j*rx + (rx-1)/2,
        # so the four bilinear corners are REGULAR STRIDED SLICES of the
        # label map with constant weights — no dynamic gather.  (The
        # general corner gather below costs ~0.9 ms/step at the 448^2
        # recipe: four 12.5k-row gathers against a batch-minor [B, H*W]
        # layout; the slices are free.)  Bit-equal to the gather path:
        # tx = ty = 0.5 exactly for even ratios (0 for odd), and
        # 0.25*(a+b+c+d) with one-hot {0,1} corners is exact in f32.
        ry, rx = H // h, W // w
        oy, ox = (ry - 1) // 2, (rx - 1) // 2
        ty, tx = ((ry - 1) % 2) * 0.5, ((rx - 1) % 2) * 0.5
        ids = jnp.arange(1, num_ids + 1, dtype=seg.dtype)

        def corner(dy, dx, wgt):
            if wgt == 0.0:
                return 0.0
            c = seg[:, oy + dy::ry, ox + dx::rx][:, :h, :w]        # [B, h, w]
            onehot = c[:, None, :, :] == ids[None, :, None, None]
            return onehot.astype(jnp.float32) * wgt

        return (corner(0, 0, (1 - ty) * (1 - tx))
                + corner(0, 1, (1 - ty) * tx)
                + corner(1, 0, ty * (1 - tx))
                + corner(1, 1, ty * tx))
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (W / w) - 0.5   # [w]
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (H / h) - 0.5   # [h]
    gx = jnp.broadcast_to(x[None, :], (h, w)).reshape(-1)
    gy = jnp.broadcast_to(y[:, None], (h, w)).reshape(-1)
    gx = jnp.broadcast_to(gx[None], (B, h * w))
    gy = jnp.broadcast_to(gy[None], (B, h * w))
    out = _label_onehot_at(seg, gx, gy, num_ids)                   # [B, G, hw]
    return out.reshape(B, num_ids, h, w)
