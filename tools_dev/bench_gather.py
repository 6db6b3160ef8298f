"""Isolate the ms-deform-attn gather cost on TPU and test alternatives."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RT = 0.030
N = 8

B, M, D = 10, 8, 16
SHAPES = [(17, 16), (34, 32), (67, 63)]  # res5, res4, res3 at 530x500
S = sum(h * w for h, w in SHAPES)
Lq = S
P = 4
L = 3


def timed(label, fn, *args):
    @jax.jit
    def loop(c):
        def body(i, c):
            out = fn(c, *args)
            return out.astype(jnp.float32).ravel()[0] * 1e-30 + c
        return jax.lax.fori_loop(0, N, body, c)

    float(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    float(loop(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0 - RT) / N
    print(f"{label}: {dt*1000:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    value = jax.device_put(jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16))
    locs = jax.device_put(jnp.asarray(rng.rand(B, Lq, M, L, P, 2), jnp.float32))
    attn = jax.device_put(jnp.asarray(rng.rand(B, Lq, M, L, P), jnp.float32))

    from pctrans_tpu.ops.msdeform import ms_deform_attn_core
    timed("ms_deform_attn_core (take_along_axis x4 corners x3 levels)",
          lambda c: ms_deform_attn_core(value + c.astype(value.dtype), SHAPES, locs, attn))

    # single raw gather at the res3 level for reference
    H, W = SHAPES[2]
    v3 = jax.device_put(jnp.asarray(rng.randn(B, M, H * W, D), jnp.bfloat16))
    idx = jax.device_put(jnp.asarray(rng.randint(0, H * W, (B, M, Lq * P)), jnp.int32))
    timed("one take_along_axis gather (res3)",
          lambda c: jnp.take_along_axis(v3 + c.astype(v3.dtype), idx[..., None], axis=2))

    # one-hot matmul variant of the same gather+blend for one level
    def onehot_level(c, v, x, y, w, Hl, Wl):
        # v [B, M, S_l, D]; x,y [B, Lq, M, P] float coords; w [B, Lq, M, P]
        v = v + c.astype(v.dtype)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        tx = x - x0; ty = y - y0
        Sl = Hl * Wl
        toks = jnp.arange(Sl, dtype=jnp.int32)

        out = jnp.zeros((B, Lq, M, D), jnp.float32)
        for dx, dy, wf in ((0, 0, (1 - tx) * (1 - ty)), (1, 0, tx * (1 - ty)),
                           (0, 1, (1 - tx) * ty), (1, 1, tx * ty)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            ok = (xi >= 0) & (xi < Wl) & (yi >= 0) & (yi < Hl)
            sid = jnp.clip(yi, 0, Hl - 1) * Wl + jnp.clip(xi, 0, Wl - 1)
            coef = (w * wf * ok).astype(jnp.bfloat16)         # [B, Lq, M, P]
            onehot = (sid[..., None] == toks).astype(jnp.bfloat16)  # [B,Lq,M,P,Sl]
            Wmat = jnp.einsum("bqmp,bqmps->bqms", coef, onehot)
            out = out + jnp.einsum("bqms,bmsd->bqmd", Wmat,
                                   jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
        return out

    x3 = locs[..., 2, :, 0] * W - 0.5
    y3 = locs[..., 2, :, 1] * H - 0.5
    w3 = attn[..., 2, :]
    v3l = jax.device_put(jnp.asarray(rng.randn(B, M, H * W, D), jnp.bfloat16))
    timed("one-hot matmul blend (res3 level only)",
          lambda c: onehot_level(c, jnp.swapaxes(v3l, 1, 2), x3, y3, w3, H, W))


if __name__ == "__main__":
    main()
