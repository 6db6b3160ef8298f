"""Pallas TPU kernel v2 for multi-scale deformable attention.

Same op as the reference CUDA kernel (connectomics/model/maskformer_block/
pixel_decoder/ops/src/cuda/ms_deform_im2col_cuda.cuh:38-120); see
ops/msdeform.py for the op contract and the XLA formulations.

Why v2 (vs msdeform_pallas.py): profiling the round-1 setups showed
  * the XLA hat-matmul's MXU output width is D = 16 of 128 lanes
    (~12.5% utilization on the dominant dot), and its lax.scan chunking
    spends more device time on dynamic-update-slice writes, copies and
    pads than on the dots themselves (eval-trace: 33 + 27 + 10 ms of a
    159 ms step);
  * the v1 Pallas kernel was grid-overhead-bound: 3520 steps of ~90 MFLOP
    with tiny [CH, 4] DMAs (~8.8 us/step).

v2 keeps everything sample-major in the LANE dimension:

  stage 1 (MXU):  t[(h,d), n] = sum_w V[(h,d), w] * hat_x[w, n]
                  — rows h*D+d (~1000), lanes n = a 512-query-chunk of
                  (query, point) samples, contraction over W;
  stage 2 (VPU):  out[d, n] = sum_h hat_y[h, n] * w[n] * t[(h,d), n]
                  — reshape t to [H, D, n] (sublane-aligned split, D = 16
                  is a multiple of the 8-row tile) and reduce the leading
                  dim with a broadcast multiply; no gathers, no relayouts.

Grid is one step per (batch*head): every level's value map stays VMEM-
resident, per-chunk work comes from an in-kernel fori_loop, and all DMAs
are >= 90 KB.  All levels run inside ONE pallas_call (round 4; they were
separate calls summed in HBM before): the per-chunk accumulator crosses
levels in VMEM, the `loc*W - 0.5` pixel-coordinate scaling happens on the
VPU instead of materializing per-level scaled copies, and the output is
written once in the value dtype (bf16 at eval) instead of three f32
buffers + adds + a trailing astype pass — at the CVPPP eval shape that
deletes ~170 MB/encoder-layer of pure HBM marshalling (the round-3 eval
roofline's "layout" family).

The backward runs as a second Pallas kernel with the same layout (one
grid step per batch*head, value map and all intermediates VMEM-resident):

  recompute t  (MXU):  t[(h,d), n] = sum_w V[(h,d), w] * hat_x[w, n]
  d_attn (VPU):        r[h, n] = sum_d g[d, n] * t[(h,d), n]
                       dw[n]   = sum_h hy[h, n] * r[h, n]
  d_y    (VPU):        dy[n]   = w[n] * sum_h hy'[h, n] * r[h, n]
  u      (VPU):        u[(h,d), n] = g[d, n] * hy[h, n] * w[n]
  d_x    (MXU+VPU):    s[w, n] = sum_{hd} V[(h,d), w] * u[(h,d), n]
                       dx[n]   = sum_w hat_x'[w, n] * s[w, n]
  d_value (MXU):       dV[(h,d), w] += sum_n u[(h,d), n] * hat_x[w, n]

(hat' = sign(s - p) on the hat's support — the exact a.e. derivative of
relu(1 - |s - p|), matching JAX's AD of the XLA formulations.)  Unlike the
XLA hat-matmul adjoint — whose fused generator does H*W VPU work per
sample and re-does it in the backward — every stage here is separable
(H + W work per sample), so fwd+bwd measured 2.4 ms/encoder-layer at the
448^2 train shape vs 5.0 ms for the hat-matmul under AD
(tools_dev/bench_msda.py, all three grads fetched).  Deterministic, unlike
the reference's atomicAdd col2im backward.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_kernel(xy_ref, w_ref, *refs, shapes, P: int, D: int, N: int,
                  n_chunks: int):
    """One (batch*head) slab, ALL levels.

    xy:   [1, 2*L*P, n_chunks, N] f32 NORMALIZED coords, rows (c, l, p)
    w:    [1, L*P, n_chunks, N] f32 attention weights, rows (l, p)
    refs: L value maps [1, H_l*D, W_l] (rows h*D + d) then the output
          o [1, n_chunks, D, N] in the value dtype.
    """
    L = len(shapes)
    v_refs = refs[:L]
    o_ref = refs[L]

    def chunk_body(qc, carry):
        acc = jnp.zeros((D, N), jnp.float32)
        for lid, (H, W) in enumerate(shapes):  # static unroll; L is 3
            v = v_refs[lid][0]  # [H*D, W]
            lacc = jnp.zeros((H, D, N), jnp.float32)
            for p in range(P):  # static unroll; P is 4
                # pixel-coordinate scaling on the VPU (was a per-level
                # elementwise pass in HBM)
                x = xy_ref[0, (0 * L + lid) * P + p, qc, :] * W - 0.5  # [N]
                y = xy_ref[0, (1 * L + lid) * P + p, qc, :] * H - 0.5
                w = w_ref[0, lid * P + p, qc, :]
                # tpu iota is integer-only; convert after
                sx = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0).astype(
                    jnp.float32)
                hx = jax.nn.relu(1.0 - jnp.abs(sx - x[None, :]))  # [W, N]
                t = jax.lax.dot_general(                          # [H*D, N]
                    v, hx.astype(v.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sy = jax.lax.broadcasted_iota(jnp.int32, (H, 1, N), 0).astype(
                    jnp.float32)
                hyw = jax.nn.relu(1.0 - jnp.abs(sy - y[None, None, :])) \
                    * w[None, None, :]                            # [H, 1, N]
                lacc = lacc + t.reshape(H, D, N) * hyw
            acc = acc + lacc.sum(axis=0)
        o_ref[0, qc, :, :] = acc.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_chunks, chunk_body, None)


def _level_bwd_kernel(x_ref, y_ref, w_ref, g_ref, v_ref,
                      dv_ref, dx_ref, dy_ref, dw_ref, *, H: int, W: int,
                      P: int, D: int, N: int, n_chunks: int):
    """Backward of one (batch*head) slab of one level.

    x/y/w: [1, P, n_chunks, N] f32;  g: [1, n_chunks, D, N] f32 cotangent;
    v:     [1, H*D, W] value map (compute dtype)
    dv:    [1, H*D, W] f32;  dx/dy/dw: [1, P, n_chunks, N] f32.
    """
    v = v_ref[0]                                          # [H*D, W]

    def chunk_body(qc, dv_acc):
        g = g_ref[0, qc]                                  # [D, N]
        for p in range(P):  # static unroll; P is 4
            x = x_ref[0, p, qc, :]                        # [N]
            y = y_ref[0, p, qc, :]
            w = w_ref[0, p, qc, :]
            sx = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0).astype(
                jnp.float32)
            hx = jax.nn.relu(1.0 - jnp.abs(sx - x[None, :]))      # [W, N]
            # a.e. derivative of relu(1 - |sx - x|) wrt x: sign(sx - x)
            # on the open support (JAX AD: relu'(0) = 0, sign(0) = 0)
            hxd = jnp.where(hx > 0, jnp.sign(sx - x[None, :]), 0.0)
            sy = jax.lax.broadcasted_iota(jnp.int32, (H, N), 0).astype(
                jnp.float32)
            hy = jax.nn.relu(1.0 - jnp.abs(sy - y[None, :]))      # [H, N]
            hyd = jnp.where(hy > 0, jnp.sign(sy - y[None, :]), 0.0)

            # recompute stage-1: t[(h,d), n]
            t = jax.lax.dot_general(
                v, hx.astype(v.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(H, D, N)
            r = (t * g[None, :, :]).sum(axis=1)           # [H, N]
            dw_ref[0, p, qc, :] = (hy * r).sum(axis=0)
            dy_ref[0, p, qc, :] = w * (hyd * r).sum(axis=0)

            # u[(h,d), n] = g[d,n] * hy[h,n] * w[n]
            u = (g[None, :, :] * (hy * w[None, :])[:, None, :]).reshape(
                H * D, N)
            s = jax.lax.dot_general(                      # [W, N]
                v, u.astype(v.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dx_ref[0, p, qc, :] = (hxd * s).sum(axis=0)
            dv_acc = dv_acc + jax.lax.dot_general(        # [H*D, W]
                u.astype(v.dtype), hx.astype(v.dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return dv_acc

    dv_ref[0] = jax.lax.fori_loop(
        0, n_chunks, chunk_body, jnp.zeros((H * D, W), jnp.float32))


def _backward(value, spatial_shapes, sampling_locations, attention_weights,
              g, chunk: int):
    """Pallas backward: returns (d_value, d_locations, d_weights) with the
    primals' dtypes.  Same per-level layout as :func:`_forward`."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    N = max(128, min(chunk, -(-Lq // 128) * 128))
    n_chunks = -(-Lq // N)
    Lp = n_chunks * N
    pad_q = Lp - Lq

    locs = sampling_locations.astype(jnp.float32)
    wts = attention_weights.astype(jnp.float32)
    gq = g.astype(jnp.float32).reshape(B, Lq, M, D)
    if pad_q:
        locs = jnp.pad(locs, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0),
                              (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)))
        gq = jnp.pad(gq, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    locs = jnp.transpose(locs, (3, 0, 2, 4, 1, 5)).reshape(
        L, B * M, P, n_chunks, N, 2)
    wts = jnp.transpose(wts, (3, 0, 2, 4, 1)).reshape(
        L, B * M, P, n_chunks, N)
    # [B, Lp, M, D] -> [B*M, n_chunks, D, N] (the forward output's layout)
    gq = jnp.transpose(gq, (0, 2, 3, 1)).reshape(
        B * M, D, n_chunks, N).transpose(0, 2, 1, 3)

    interpret = _use_interpret()
    dval_parts = []
    dx_parts = []
    dy_parts = []
    dw_parts = []
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]
        v2 = jnp.transpose(v.reshape(B, H, W, M, D), (0, 3, 1, 4, 2))
        v2 = v2.reshape(B * M, H * D, W)
        x = locs[lid, ..., 0] * W - 0.5
        y = locs[lid, ..., 1] * H - 0.5
        w = wts[lid]

        kern = functools.partial(_level_bwd_kernel, H=H, W=W, P=P, D=D, N=N,
                                 n_chunks=n_chunks)
        pnc = pl.BlockSpec((1, P, n_chunks, N), lambda bm: (bm, 0, 0, 0))
        dv2, dx, dy, dw = pl.pallas_call(
            kern,
            grid=(B * M,),
            in_specs=[
                pnc, pnc, pnc,
                pl.BlockSpec((1, n_chunks, D, N), lambda bm: (bm, 0, 0, 0)),
                pl.BlockSpec((1, H * D, W), lambda bm: (bm, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, H * D, W), lambda bm: (bm, 0, 0)),
                pnc, pnc, pnc,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B * M, H * D, W), jnp.float32),
                jax.ShapeDtypeStruct((B * M, P, n_chunks, N), jnp.float32),
                jax.ShapeDtypeStruct((B * M, P, n_chunks, N), jnp.float32),
                jax.ShapeDtypeStruct((B * M, P, n_chunks, N), jnp.float32),
            ],
            interpret=interpret,
        )(x, y, w, gq, v2)

        # [BM, H*D, W] -> [B, H*W, M, D]
        dv2 = dv2.reshape(B, M, H, D, W)
        dval_parts.append(
            jnp.transpose(dv2, (0, 2, 4, 1, 3)).reshape(B, H * W, M, D))
        dx_parts.append(dx * W)  # chain through x = loc_x * W - 0.5
        dy_parts.append(dy * H)
        dw_parts.append(dw)
        start += H * W

    d_value = jnp.concatenate(dval_parts, axis=1).astype(value.dtype)

    def _unpack(parts):
        # [L, BM, P, n_chunks, N] -> [B, Lq, M, L, P]
        a = jnp.stack(parts, axis=0).reshape(L, B, M, P, Lp)
        return jnp.transpose(a, (1, 4, 2, 0, 3))[:, :Lq]

    dl = jnp.stack([_unpack(dx_parts), _unpack(dy_parts)], axis=-1)
    d_locs = dl.astype(sampling_locations.dtype)
    d_wts = _unpack(dw_parts).astype(attention_weights.dtype)
    return d_value, d_locs, d_wts


def _forward(value, spatial_shapes, sampling_locations, attention_weights,
             chunk: int):
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes)

    N = max(128, min(chunk, -(-Lq // 128) * 128))
    n_chunks = -(-Lq // N)
    Lp = n_chunks * N
    pad_q = Lp - Lq

    locs = sampling_locations.astype(jnp.float32)
    wts = attention_weights.astype(jnp.float32)
    if pad_q:  # padded rows get weight 0 -> zero output rows, sliced off
        locs = jnp.pad(locs, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0),
                              (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)))
    # [B, Lp, M, L, P, c] -> [BM, 2*L*P, n_chunks, N] rows (c, l, p),
    # NORMALIZED (the kernel scales); [B, Lp, M, L, P] -> [BM, L*P, nc, N]
    xy = jnp.transpose(locs, (0, 2, 5, 3, 4, 1)).reshape(
        B * M, 2 * L * P, n_chunks, N)
    wt = jnp.transpose(wts, (0, 2, 3, 4, 1)).reshape(
        B * M, L * P, n_chunks, N)

    v2s = []
    start = 0
    for (H, W) in spatial_shapes:
        v = value[:, start : start + H * W]  # [B, HW, M, D]
        # -> [B*M, H*D, W]: rows h*D + d for the stage-2 sublane split
        v2 = jnp.transpose(v.reshape(B, H, W, M, D), (0, 3, 1, 4, 2))
        v2s.append(v2.reshape(B * M, H * D, W))
        start += H * W

    kern = functools.partial(_fused_kernel, shapes=tuple(spatial_shapes),
                             P=P, D=D, N=N, n_chunks=n_chunks)
    pnc = lambda r: pl.BlockSpec((1, r, n_chunks, N),  # noqa: E731
                                 lambda bm: (bm, 0, 0, 0))
    out = pl.pallas_call(
        kern,
        grid=(B * M,),
        in_specs=[pnc(2 * L * P), pnc(L * P)] + [
            pl.BlockSpec((1, H * D, W), lambda bm: (bm, 0, 0))
            for (H, W) in spatial_shapes
        ],
        out_specs=pl.BlockSpec((1, n_chunks, D, N),
                               lambda bm: (bm, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * M, n_chunks, D, N), value.dtype),
        interpret=_use_interpret(),
    )(xy, wt, *v2s)

    # [BM, n_chunks, D, N] -> [B, Lq, M*D] (already the value dtype)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, M, D, Lp)[..., :Lq]
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(B, Lq, M * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_core_pallas2(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    chunk: int = 512,
) -> jnp.ndarray:
    """Pallas-TPU v2 forward of ms-deform-attn (see module docstring).

    value: [B, S, M, D]; sampling_locations: [B, Lq, M, L, P, 2] in [0, 1];
    attention_weights: [B, Lq, M, L, P].  Returns [B, Lq, M * D].
    """
    return _forward(value, tuple(spatial_shapes), sampling_locations,
                    attention_weights, chunk)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights, chunk):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights, chunk)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, chunk, res, g):
    value, locs, wts = res
    import os

    if os.environ.get("PCTRANS_MSDA_BWD", "pallas") == "matmul":
        # Escape hatch: adjoints through the fused hat-matmul (the XLA
        # formulation's AD) — identical math, matmul-structured.  ~2.5x
        # slower than the Pallas backward at train shapes (its fused
        # generator does H*W VPU work per sample, twice under AD).
        from .msdeform import ms_deform_attn_core

        _, vjp = jax.vjp(
            lambda v, l, a: ms_deform_attn_core(v, spatial_shapes, l, a),
            value, locs, wts,
        )
        return vjp(g)
    return _backward(value, spatial_shapes, locs, wts, g, chunk)


ms_deform_attn_core_pallas2.defvjp(_fwd, _bwd)
