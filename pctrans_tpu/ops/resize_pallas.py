"""Pallas TPU kernel: fused bilinear mask upsample + threshold binarize.

The eval protocol upsamples every kept query's stride-4 mask logits to the
input resolution and thresholds them (reference arch/maskformer.py:214-219
``F.interpolate`` + sigmoid, then ``> t`` in instance_inference).  XLA
lowers ``jax.image.resize`` to two separable dot_generals and MATERIALIZES
the full-resolution f32 logits in HBM before the compare — at BBBC eval
shapes that is an 868 MB f32 tensor written and re-read for a u8 result
(profiled: 5.2 ms of dots + ~1.1 ms of binarize in a 28.9 ms step, the
single largest eval family after the ms-deform kernels).

This kernel keeps the full-resolution logits in VMEM: per (batch, query)
grid step it runs the two interpolation dots (W axis then H axis, same
separable order XLA uses) and writes ONLY the u8 comparison result — HBM
traffic drops from read 54 + write 868 + read 868 + write 217 MB to
read 54 + write 217 MB.

Numerics: the interpolation weight matrices are ``jax.image.resize`` of an
identity (bit-identical coefficients by construction), and the dots use
bf16 operands with f32 accumulation — the same quantization points as
XLA's default-precision dot lowering on TPU, so the fused path matches the
unfused TPU path up to f32 accumulation order (gated on-device in
bench.py ``kernel_check``; borderline threshold flips are bounded there).
The compare runs on the f32 accumulator BEFORE any output rounding.
Off-TPU the dispatcher uses the plain XLA path (resize then compare) —
the CPU oracle semantics tests rely on.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def resize_weights(in_size: int, out_size: int) -> jnp.ndarray:
    """[out, in] bilinear (align_corners=False) interpolation matrix —
    ``jax.image.resize`` applied to an identity, so the coefficients are
    bit-identical to the unfused path's by construction."""
    return jax.image.resize(jnp.eye(in_size, dtype=jnp.float32),
                            (out_size, in_size), method="bilinear",
                            antialias=False)


def _kernel(x_ref, ww_ref, wh_ref, o_ref, *, logit_t: float):
    x = x_ref[0].astype(jnp.bfloat16)            # [h, w]
    ww = ww_ref[...].astype(jnp.bfloat16)        # [w, W]  (transposed [W,w])
    wh = wh_ref[...].astype(jnp.bfloat16)        # [H, h]
    # W axis first, then H — the separable order XLA's lowering uses
    t1 = jax.lax.dot_general(x, ww, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [h, W]
    out = jax.lax.dot_general(wh, t1.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [H, W]
    o_ref[0] = (out > logit_t).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("size", "logit_t", "interpret"))
def _pallas_resize_binarize(x: jnp.ndarray, size: Tuple[int, int],
                            logit_t: float,
                            interpret: bool = False) -> jnp.ndarray:
    """Raw kernel call ([B, Q, h, w] -> [B, Q, H, W] u8); ``interpret``
    exercises the kernel body off-TPU (tests)."""
    B, Q, h, w = x.shape
    H, W = size
    ww = resize_weights(w, W).T                  # [w, W]
    wh = resize_weights(h, H)                    # [H, h]
    out = pl.pallas_call(
        functools.partial(_kernel, logit_t=logit_t),
        grid=(B * Q,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((w, W), lambda i: (0, 0)),
            pl.BlockSpec((H, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Q, H, W), jnp.uint8),
        interpret=interpret,
    )(x.reshape(B * Q, h, w), ww, wh)
    return out.reshape(B, Q, H, W)


def resize_bilinear_binarize(x: jnp.ndarray, size: Tuple[int, int],
                             logit_t: float) -> jnp.ndarray:
    """[B, Q, h, w] f32 logits -> [B, Q, H, W] u8 (bilinear upsample, then
    ``> logit_t``), full-resolution f32 never touching HBM on TPU."""
    if _use_interpret():
        # off-TPU: plain XLA path (reference semantics, f32 throughout)
        from .resize import resize_bilinear

        return (resize_bilinear(x, size) > logit_t).astype(jnp.uint8)
    return _pallas_resize_binarize(x, size, logit_t)
