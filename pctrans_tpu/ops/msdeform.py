"""Multi-scale deformable attention core (pure JAX).

TPU-native equivalent of the reference CUDA kernel
(connectomics/model/maskformer_block/pixel_decoder/ops/src/cuda/
ms_deform_im2col_cuda.cuh) and its grid_sample-based torch fallback
(ops/functions/ms_deform_attn_func.py:52-72): for every query, head and
feature level, bilinearly sample ``n_points`` locations from the flattened
value map and blend them with softmax attention weights.

The sampling grid follows torch ``grid_sample(align_corners=False,
padding_mode='zeros')`` on ``grid = 2*loc - 1``: pixel position =
``loc * size - 0.5``, out-of-bounds corners contribute zero.

Shapes (L levels, static ``spatial_shapes``):
  value:              [B, S, M, D]     S = sum(H_l * W_l)
  sampling_locations: [B, Lq, M, L, P, 2]   normalized (x, y) in [0, 1]
  attention_weights:  [B, Lq, M, L, P]
  returns:            [B, Lq, M * D]

TPU implementation note.  XLA's gather on TPU is row-serial (~4ns/row
measured on v5e regardless of row size up to ~512B), so the naive
4-corners x L-levels formulation — 12 separate ``take_along_axis`` calls of
[*, D=16] rows — costs ~260ms per encoder layer at CVPPP shapes and made
the pixel decoder 97% of the whole forward.  The production path
(:func:`ms_deform_attn_core`) instead folds the 2x2 bilinear neighborhood
into precomputed *patch rows* ``[v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)]``
(built with one zero-pad + 4 static slices per level, exact at borders) and
issues ONE flat-index gather of [*, 4D] rows per level — 12x fewer rows,
~20ms per layer.  :func:`ms_deform_attn_core_reference` keeps the
straightforward 4-gather formulation (validated against the torch oracle in
tests/test_ops.py) as the semantics reference; the production path is
tested to match it exactly.

Gradients come from JAX AD (gather -> scatter-add), which unlike the
reference's atomicAdd-based CUDA backward is deterministic.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Implementation dispatcher (the model-facing entry point).

    ``impl`` (or ``$PCTRANS_MSDA_IMPL``): ``matmul`` | ``pallas`` |
    ``pallas2`` | ``separable`` | ``gather`` | ``reference`` | ``auto``.

    ``auto`` picks the Pallas v2 kernel (msdeform_pallas2.py) on TPU and
    the XLA hat-matmul elsewhere.  Measured fwd ms/layer-call on a v5e
    (tools_dev/bench_msda.py, train 448^2 b2 / eval 530x500 b10):
    pallas2 0.8/5.1, matmul 1.4/12.5 (MXU output-width-bound at D=16),
    pallas v1 4.9/31 (grid-overhead-bound), separable 5.1/36 (stage-1
    intermediate round-trips HBM), patch gather 7.4/56 (row-serial).
    """
    # $PCTRANS_MSDA_IMPL overrides only the auto dispatch (whole-run
    # experiments); an explicit impl= argument always wins, so tests that
    # pin an implementation stay meaningful under a stray env var.
    if impl in (None, "auto", "auto_train"):
        impl = os.environ.get("PCTRANS_MSDA_IMPL") or impl or "auto"
    if impl == "auto":
        # The Pallas v2 kernel wins on TPU for forward-only use (eval
        # layer-call 5.1 vs 12.3 ms — tools_dev/bench_msda.py); the XLA
        # hat-matmul is the fallback for CPU and any non-TPU backend.
        impl = "pallas2" if jax.default_backend() == "tpu" else "matmul"
    elif impl == "auto_train":
        # pallas2 now ships its own separable backward kernel
        # (msdeform_pallas2._backward): fwd+bwd 2.4 vs 5.0 ms/layer at the
        # train shapes (tools_dev/bench_msda.py, all three grads fetched —
        # the earlier 2.28 ms hat-matmul figure was XLA DCE-ing d_locs and
        # d_attn).  Hat-matmul stays the non-TPU fallback.
        impl = "pallas2" if jax.default_backend() == "tpu" else "matmul"
    if impl == "pallas":
        from .msdeform_pallas import ms_deform_attn_core_pallas

        return ms_deform_attn_core_pallas(
            value, tuple(spatial_shapes), sampling_locations, attention_weights)
    if impl == "pallas2":
        from .msdeform_pallas2 import ms_deform_attn_core_pallas2

        return ms_deform_attn_core_pallas2(
            value, tuple(spatial_shapes), sampling_locations, attention_weights)
    fn = {
        "matmul": ms_deform_attn_core,
        "separable": ms_deform_attn_core_separable,
        "gather": ms_deform_attn_core_gather,
        "reference": ms_deform_attn_core_reference,
    }[impl]
    return fn(value, spatial_shapes, sampling_locations, attention_weights)


def ms_deform_attn_core(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    chunk: int = 128,
) -> jnp.ndarray:
    """Hat-product matmul formulation — zero gathers, pure MXU.

    Bilinear interpolation at (x, y) is the rank-1 form
    ``hat(y - sy) V[sy, sx] hat(x - sx)`` with ``hat(t) = max(0, 1 - |t|)``,
    which also reproduces grid_sample's zero padding exactly (both hats
    vanish more than one pixel outside the map, and in-range products are
    bit-identical to the 4-corner weights).  Per level, a chunk of sample
    rows is blended with ONE dot_general whose LHS is the *generator*
    ``W[n, sy, sx] = hy[n, sy] * hx[n, sx]`` (attention weight folded into
    ``hy``); XLA fuses the outer-product generator into the matmul tiling,
    so W never materializes in HBM.

    Measured on v5e at CVPPP eval shapes: ~4.7 ms for the stride-8 level
    (vs ~90 ms for the flat patch gather and ~260 ms for naive
    take_along_axis — XLA's gather is row-serial at ~4ns/row, see
    tools_dev/bench_gather.py).  The gradient is again matmuls (no
    scatter-add), and deterministic unlike the reference's atomicAdd CUDA
    backward.  Hat coordinates are computed in f32 (bf16 would quantize
    pixel positions); the dot runs in the value's dtype.

    value: [B, S, M, D]; sampling_locations: [B, Lq, M, L, P, 2] in [0, 1];
    attention_weights: [B, Lq, M, L, P].  Returns [B, Lq, M * D].
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    cdt = jnp.promote_types(value.dtype, jnp.float32)  # coordinate/accum dtype
    vdt = value.dtype                                   # dot dtype

    CH = max(1, min(chunk, Lq))
    n_chunks = -(-Lq // CH)
    Lp = n_chunks * CH
    pad_q = Lp - Lq
    NP = CH * P

    # [B, Lq, M, L, P, c] -> per-level [B, M, Lp*P] with row index q*P + p
    locs = sampling_locations.astype(cdt)
    wts = attention_weights.astype(cdt)
    if pad_q:  # padded rows get weight 0 -> zero contribution
        locs = jnp.pad(locs, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)))
    locs = jnp.transpose(locs, (3, 0, 2, 1, 4, 5))      # [L, B, M, Lp, P, 2]
    wts = jnp.transpose(wts, (3, 0, 2, 1, 4))           # [L, B, M, Lp, P]

    out = jnp.zeros((B, Lp, M, D), dtype=cdt)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]             # [B, HW, M, D]
        v5 = jnp.transpose(v.reshape(B, H, W, M, D), (0, 3, 1, 2, 4)).astype(vdt)
        x = locs[lid, ..., 0] * W - 0.5                 # [B, M, Lp, P]
        y = locs[lid, ..., 1] * H - 0.5
        w = wts[lid]                                    # [B, M, Lp, P]
        # chunk rows along the query axis; scan slices on the leading axis
        xch = x.reshape(B, M, n_chunks, NP).transpose(2, 0, 1, 3)
        ych = y.reshape(B, M, n_chunks, NP).transpose(2, 0, 1, 3)
        wch = w.reshape(B, M, n_chunks, NP).transpose(2, 0, 1, 3)
        sy = jnp.arange(H, dtype=cdt)
        sx = jnp.arange(W, dtype=cdt)

        # checkpoint: AD would otherwise save the [B, M, NP, H, W] hat
        # generator per chunk as a scan residual; recompute it instead.
        @jax.checkpoint
        def body(carry, xs, v5=v5, sy=sy, sx=sx):
            xc, yc, wc = xs                             # [B, M, NP]
            hy = jax.nn.relu(1.0 - jnp.abs(yc[..., None] - sy)) * wc[..., None]
            hx = jax.nn.relu(1.0 - jnp.abs(xc[..., None] - sx))
            wm = (hy[..., :, None] * hx[..., None, :]).astype(vdt)  # generator
            o = jax.lax.dot_general(
                wm, v5,
                dimension_numbers=(((3, 4), (2, 3)), ((0, 1), (0, 1))),
                preferred_element_type=cdt,
            )
            return carry, o                             # [B, M, NP, D]

        _, ys = jax.lax.scan(body, None, (xch, ych, wch))
        # [n_chunks, B, M, NP, D] -> sum over P -> [B, Lp, M, D]
        ys = ys.reshape(n_chunks, B, M, CH, P, D).sum(4)
        out = out + jnp.transpose(ys, (1, 0, 3, 2, 4)).reshape(B, Lp, M, D)
        start += H * W
    return out[:, :Lq].reshape(B, Lq, M * D).astype(value.dtype)


def ms_deform_attn_core_separable(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    chunk: int = 128,
) -> jnp.ndarray:
    """Two-stage separable hat contraction — MXU at full width.

    The fused-generator path (:func:`ms_deform_attn_core`) runs its dot with
    free dimension D = 16 per head, using 16/128 of the MXU's output tile.
    Splitting bilinear interpolation into its separable factors fixes that:

      stage 1 (MXU):  T[n, h, :] = hat_x[n, :] @ V[:, h, :]
                      — contraction over W with free dims H*D (~900): lhs
                      rows are (query, point) pairs, RHS is the value map
                      transposed to [W, H*D].
      stage 2 (VPU):  out[q] = sum_{p, h} w_p * hat_y[q, p, h] * T[qp, h, :]

    Same FLOP count as the 4-corner sum, ~8x better MXU occupancy than the
    fused generator at D=16.  Numerics identical (exact bilinear hats).
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    cdt = jnp.promote_types(value.dtype, jnp.float32)
    vdt = value.dtype

    CH = max(1, min(chunk, Lq))
    n_chunks = -(-Lq // CH)
    Lp = n_chunks * CH
    pad_q = Lp - Lq
    NP = CH * P

    locs = sampling_locations.astype(cdt)
    wts = attention_weights.astype(cdt)
    if pad_q:
        locs = jnp.pad(locs, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)))
    locs = jnp.transpose(locs, (3, 0, 2, 1, 4, 5))      # [L, B, M, Lp, P, 2]
    wts = jnp.transpose(wts, (3, 0, 2, 1, 4))           # [L, B, M, Lp, P]

    out = jnp.zeros((B, Lp, M, D), dtype=cdt)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]             # [B, HW, M, D]
        # [B, M, W, H*D] — stage-1 RHS
        vT = jnp.transpose(v.reshape(B, H, W, M, D), (0, 3, 2, 1, 4))
        vT = vT.reshape(B, M, W, H * D).astype(vdt)
        x = locs[lid, ..., 0] * W - 0.5                 # [B, M, Lp, P]
        y = locs[lid, ..., 1] * H - 0.5
        w = wts[lid]
        xch = x.reshape(B, M, n_chunks, NP).transpose(2, 0, 1, 3)
        ych = y.reshape(B, M, n_chunks, NP).transpose(2, 0, 1, 3)
        wch = w.reshape(B, M, n_chunks, NP).transpose(2, 0, 1, 3)
        sy = jnp.arange(H, dtype=cdt)
        sx = jnp.arange(W, dtype=cdt)

        @jax.checkpoint
        def body(carry, xs, vT=vT, sy=sy, sx=sx, H=H, W=W):
            xc, yc, wc = xs                             # [B, M, NP]
            hx = jax.nn.relu(1.0 - jnp.abs(xc[..., None] - sx)).astype(vdt)
            t = jax.lax.dot_general(                     # [B, M, NP, H*D]
                hx, vT,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=cdt,
            ).reshape(*xc.shape, H, D)
            hy = jax.nn.relu(1.0 - jnp.abs(yc[..., None] - sy)) * wc[..., None]
            o = jnp.einsum("bmnh,bmnhd->bmnd", hy, t.astype(cdt))
            return carry, o                              # [B, M, NP, D]

        _, ys = jax.lax.scan(body, None, (xch, ych, wch))
        ys = ys.reshape(n_chunks, B, M, CH, P, D).sum(4)
        out = out + jnp.transpose(ys, (1, 0, 3, 2, 4)).reshape(B, Lp, M, D)
        start += H * W
    return out[:, :Lq].reshape(B, Lq, M * D).astype(value.dtype)


def ms_deform_attn_core_gather(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Patch-row gather formulation (one flat gather of [*, 4D] neighborhood
    rows per level).  Faster than the naive 4-corner gather on TPU (~4x) but
    still row-serial; kept for gather-friendly backends and as a second
    independent implementation for tests.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    # accumulate in >= f32 (f64 stays f64 for the exactness oracle)
    cdt = jnp.promote_types(value.dtype, jnp.float32)
    out = jnp.zeros((B, Lq, M, D), dtype=cdt)
    bm = (jnp.arange(B)[:, None] * M + jnp.arange(M)[None, :])  # [B, M]
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]                     # [B, HW, M, D]
        v = jnp.swapaxes(v, 1, 2).reshape(B, M, H, W, D)
        # patch table over the 1-padded grid: row (y', x') holds the 2x2
        # neighborhood with corners (y'-1+dy, x'-1+dx), zeros out of bounds
        vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        Hp, Wp = H + 1, W + 1
        patch = jnp.concatenate(
            [
                vp[:, :, 0:Hp, 0:Wp],           # corner (y0, x0)
                vp[:, :, 0:Hp, 1 : Wp + 1],     # corner (y0, x0+1)
                vp[:, :, 1 : Hp + 1, 0:Wp],     # corner (y0+1, x0)
                vp[:, :, 1 : Hp + 1, 1 : Wp + 1],
            ],
            axis=-1,
        ).reshape(B * M * Hp * Wp, 4 * D)

        loc = sampling_locations[:, :, :, lid].astype(cdt)  # [B, Lq, M, P, 2]
        w = attention_weights[:, :, :, lid].astype(cdt)     # [B, Lq, M, P]
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        # rows with any in-bounds corner have x0 in [-1, W-1], y0 in [-1, H-1]
        valid = (x0i >= -1) & (x0i <= W - 1) & (y0i >= -1) & (y0i <= H - 1)
        yc = jnp.clip(y0i + 1, 0, Hp - 1)
        xc = jnp.clip(x0i + 1, 0, Wp - 1)
        idx = (bm[:, None, :, None] * Hp + yc) * Wp + xc            # [B, Lq, M, P]

        rows = jnp.take(patch, idx.reshape(-1), axis=0)             # [BLqMP, 4D]
        rows = rows.reshape(B, Lq, M, P, 4, D)
        beta = jnp.stack(
            [(1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty], axis=-1
        ) * (w * valid.astype(cdt))[..., None]                      # [B, Lq, M, P, 4]
        out = out + jnp.einsum(
            "bqmpcd,bqmpc->bqmd", rows.astype(cdt), beta,
            precision=jax.lax.Precision.HIGHEST,
        )
        start += H * W
    return out.reshape(B, Lq, M * D).astype(value.dtype)


def ms_deform_attn_core_reference(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Straightforward 4-corner gather formulation (semantics oracle)."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    out = jnp.zeros((B, Lq, M, D), dtype=value.dtype)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]                     # [B, HW, M, D]
        v = jnp.swapaxes(v, 1, 2)                               # [B, M, HW, D]
        loc = sampling_locations[:, :, :, lid]                  # [B, Lq, M, P, 2]
        w = attention_weights[:, :, :, lid]                     # [B, Lq, M, P]
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        sampled = _bilinear_gather(v, x, y, H, W)               # [B, Lq, M, P, D]
        out = out + jnp.einsum("bqmpd,bqmp->bqmd", sampled, w.astype(sampled.dtype))
        start += H * W
    return out.reshape(B, Lq, M * D)


def _bilinear_gather(v: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, H: int, W: int):
    """Gather bilinear samples.

    v: [B, M, HW, D]; x, y: [B, Lq, M, P] continuous pixel coords.
    Returns [B, Lq, M, P, D] with zeros outside the map.
    """
    B, M, _, D = v.shape
    _, Lq, _, P = x.shape

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(v.dtype)
    ty = (y - y0).astype(v.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)   # [B, Lq, M, P]
        idx_m = jnp.transpose(idx, (0, 2, 1, 3)).reshape(B, M, Lq * P)
        g = jnp.take_along_axis(v, idx_m[..., None], axis=2)        # [B, M, Lq*P, D]
        g = g.reshape(B, M, Lq, P, D).transpose(0, 2, 1, 3, 4)      # [B, Lq, M, P, D]
        return g * (w * valid.astype(v.dtype))[..., None]

    return (
        corner(x0i, y0i, (1 - tx) * (1 - ty))
        + corner(x0i + 1, y0i, tx * (1 - ty))
        + corner(x0i, y0i + 1, (1 - tx) * ty)
        + corner(x0i + 1, y0i + 1, tx * ty)
    )
