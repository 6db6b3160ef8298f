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

Grid is one step per (batch*head): the level's value map stays VMEM-
resident, per-chunk work comes from an in-kernel fori_loop, and all DMAs
are >= 90 KB.  Levels run as separate pallas_calls and their outputs sum.

The backward pass re-derives gradients through the pure-JAX separable
formulation (deterministic matmul adjoints, unlike the reference's
atomicAdd col2im backward).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _level_kernel(x_ref, y_ref, w_ref, v_ref, o_ref, *, H: int, W: int,
                  P: int, D: int, N: int, n_chunks: int):
    """One (batch*head) slab of one level.

    x/y/w: [1, P, n_chunks, N] f32 pixel coords / attention weights
    v:     [1, H*D, W] value map, rows h*D + d
    o:     [1, n_chunks, D, N] f32
    """
    v = v_ref[0]  # [H*D, W]

    def chunk_body(qc, carry):
        acc = jnp.zeros((H, D, N), jnp.float32)
        for p in range(P):  # static unroll; P is 4
            x = x_ref[0, p, qc, :]                            # [N]
            y = y_ref[0, p, qc, :]
            w = w_ref[0, p, qc, :]
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
            acc = acc + t.reshape(H, D, N) * hyw
        o_ref[0, qc, :, :] = acc.sum(axis=0)
        return carry

    jax.lax.fori_loop(0, n_chunks, chunk_body, None)


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
    # [B, Lp, M, L, P, c] -> [L, B*M, P, n_chunks, N] (samples in lanes)
    locs = jnp.transpose(locs, (3, 0, 2, 4, 1, 5)).reshape(
        L, B * M, P, n_chunks, N, 2)
    wts = jnp.transpose(wts, (3, 0, 2, 4, 1)).reshape(
        L, B * M, P, n_chunks, N)

    interpret = _use_interpret()
    out = jnp.zeros((B * M, n_chunks, D, N), jnp.float32)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]  # [B, HW, M, D]
        # -> [B*M, H*D, W]: rows h*D + d for the stage-2 sublane split
        v2 = jnp.transpose(v.reshape(B, H, W, M, D), (0, 3, 1, 4, 2))
        v2 = v2.reshape(B * M, H * D, W)
        x = locs[lid, ..., 0] * W - 0.5  # [BM, P, n_chunks, N]
        y = locs[lid, ..., 1] * H - 0.5
        w = wts[lid]

        kern = functools.partial(_level_kernel, H=H, W=W, P=P, D=D, N=N,
                                 n_chunks=n_chunks)
        o = pl.pallas_call(
            kern,
            grid=(B * M,),
            in_specs=[
                pl.BlockSpec((1, P, n_chunks, N), lambda bm: (bm, 0, 0, 0)),
                pl.BlockSpec((1, P, n_chunks, N), lambda bm: (bm, 0, 0, 0)),
                pl.BlockSpec((1, P, n_chunks, N), lambda bm: (bm, 0, 0, 0)),
                pl.BlockSpec((1, H * D, W), lambda bm: (bm, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n_chunks, D, N),
                                   lambda bm: (bm, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * M, n_chunks, D, N),
                                           jnp.float32),
            interpret=interpret,
        )(x, y, w, v2)
        out = out + o
        start += H * W

    # [BM, n_chunks, D, N] -> [B, Lq, M*D]
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, M, D, Lp)[..., :Lq]
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(B, Lq, M * D).astype(
        value.dtype)


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
    # Adjoints through the fused hat-matmul (the fastest XLA formulation's
    # AD): identical math, matmul-structured, deterministic.
    from .msdeform import ms_deform_attn_core

    value, locs, wts = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_core(v, spatial_shapes, l, a),
        value, locs, wts,
    )
    return vjp(g)


ms_deform_attn_core_pallas2.defvjp(_fwd, _bwd)
