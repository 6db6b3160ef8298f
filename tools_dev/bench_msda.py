"""Micro-benchmark: ms-deform-attn implementations on the local accelerator.

Times forward and forward+backward of each implementation at the CVPPP
encoder shapes (train 448^2 batch 2, eval 530x500 batch 10), using the
device-side fori_loop + scalar-fetch methodology from bench.py (through the
remote TPU relay, block_until_ready returns early).

Usage: python tools_dev/bench_msda.py [train|eval|both]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pctrans_tpu.ops.msdeform import (
    ms_deform_attn_core,
    ms_deform_attn_core_gather,
    ms_deform_attn_core_separable,
)
from pctrans_tpu.ops.msdeform_pallas import ms_deform_attn_core_pallas
from pctrans_tpu.ops.msdeform_pallas2 import ms_deform_attn_core_pallas2

impl_filter = [a for a in sys.argv[2:]]

ROUND_TRIP_S = 0.030


def timed(loop_fn, iters):
    float(loop_fn(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(loop_fn(jnp.float32(0.0)))
    return max(time.perf_counter() - t0 - ROUND_TRIP_S, 1e-9) / iters


def bench_shape(name, B, H0, W0, dtype, iters=20):
    shapes = [(H0, W0), (H0 // 2, W0 // 2), (H0 // 4, W0 // 4)]
    S = sum(h * w for h, w in shapes)
    M, D, P = 8, 16, 4
    Lq = S
    L = len(shapes)
    r = np.random.RandomState(0)
    value = jnp.asarray(r.randn(B, S, M, D), dtype)
    locs = jnp.asarray(r.rand(B, Lq, M, L, P, 2), jnp.float32)
    attn = jnp.asarray(r.rand(B, Lq, M, L, P), jnp.float32)
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)

    impls = {
        "matmul": ms_deform_attn_core,
        "separable": ms_deform_attn_core_separable,
        "pallas": lambda v, s, l, a: ms_deform_attn_core_pallas(v, tuple(s), l, a),
        "pallas2": lambda v, s, l, a: ms_deform_attn_core_pallas2(v, tuple(s), l, a),
        "gather": ms_deform_attn_core_gather,
    }
    if impl_filter:
        impls = {k: v for k, v in impls.items() if k in impl_filter}
    print(f"== {name}: B={B} S={S} Lq={Lq} M={M} D={D} P={P} {dtype}")
    for iname, fn in impls.items():
        @jax.jit
        def fwd_loop(c, fn=fn):
            def body(i, c):
                o = fn(value, shapes, locs + c * 0, attn)
                return o.ravel()[0].astype(jnp.float32) * 1e-30 + c
            return jax.lax.fori_loop(0, iters, body, c)

        def loss(v, l, a, fn=fn):
            return (fn(v, shapes, l, a).astype(jnp.float32) ** 2).sum()

        grad = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def bwd_loop(c, grad=grad):
            def body(i, c):
                gv, gl, ga = grad(value, locs + c * 0, attn)
                # fetch a combination of ALL three grads — fetching only gv
                # lets XLA dead-code-eliminate the d_locs/d_attn computation
                # (measured: matmul "fwd+bwd" 2.38 ms with gv only vs the
                # true three-grad cost), which the train step cannot skip
                s = (gv.ravel()[0].astype(jnp.float32)
                     + gl.ravel()[0].astype(jnp.float32)
                     + ga.ravel()[0].astype(jnp.float32))
                return s * 1e-30 + c
            return jax.lax.fori_loop(0, iters, body, c)

        try:
            tf = timed(fwd_loop, iters)
            tb = timed(bwd_loop, iters)
            print(f"  {iname:8s} fwd {tf*1e3:8.2f} ms   fwd+bwd {tb*1e3:8.2f} ms")
        except Exception as e:
            print(f"  {iname:8s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for dt in (jnp.bfloat16, jnp.float32):
        if which in ("train", "both"):
            bench_shape("train 448^2", 2, 56, 56, dt)
        if which in ("eval", "both"):
            bench_shape("eval 530x500", 10, 67, 63, dt)
