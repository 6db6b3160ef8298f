"""Dynamic-mask render: Pallas kernel vs einsum formulation on TPU.

Timed at CVPPP eval shapes (B=10, Q=100, 133x125 stride-4 grid) and train
shapes (B=2, Q=100, 112x112), fwd and fwd+bwd, plus an on-device equality
check before timing (fast-wrong guard, same discipline as bench.py's
ms-deform gate)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.ops.render_pallas import dynamic_mask_render, render_reference

N = 20
RT = 0.030


def chain_time(label, fn, *args, n=N):
    jfn = jax.jit(fn)
    float(jfn(jnp.float32(0.0), *args))
    c = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        c = jfn(c, *args)
    float(c)
    dt = (time.perf_counter() - t0 - RT) / n
    print(f"{label:>28}: {dt*1e3:7.2f} ms", flush=True)
    return dt


def run(tag, B, Q, Hm, Wm, dtype):
    rng = np.random.RandomState(0)
    ch, Cm, stride = 8, 16, 4
    HW = Hm * Wm
    t = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    feats = t(B, HW, Cm).astype(dtype)
    inst = jnp.asarray((rng.rand(B, Q, 2) * [Wm * stride, Hm * stride]
                        ).astype(np.float32))
    w1, w2, w3 = t(B, Q, ch, Cm + 2), t(B, Q, ch, ch), t(B, Q, 1, ch)
    b1, b2, b3 = t(B, Q, ch), t(B, Q, ch), t(B, Q, 1)
    args = (feats, inst, w1, w2, w3, b1, b2, b3)

    # equality gate (f32 reference semantics)
    out_k = jax.jit(lambda *a: dynamic_mask_render(*a, (Hm, Wm), stride))(*args)
    out_r = jax.jit(lambda *a: render_reference(
        *a, hw=(Hm, Wm), stride=stride, dtype=jnp.float32))(
        feats.astype(jnp.float32), *args[1:])
    d = float(jnp.abs(out_k - out_r).max())
    s = float(jnp.abs(out_r).max())
    print(f"[{tag}] kernel-vs-f32-einsum max|d| {d:.2e} (scale {s:.1f})")
    assert d < 1e-2 * s + 1e-3, "render kernel mismatch on device"

    def fwd_k(c, *a):
        o = dynamic_mask_render(a[0] + c * 0, *a[1:], (Hm, Wm), stride)
        return o.ravel()[0] * 1e-30 + c

    def fwd_r(c, *a):
        o = render_reference(a[0] + c * 0, *a[1:], hw=(Hm, Wm), stride=stride,
                             dtype=dtype)
        return o.ravel()[0] * 1e-30 + c

    chain_time(f"{tag} fwd pallas", fwd_k, *args)
    chain_time(f"{tag} fwd einsum", fwd_r, *args)

    def fb_k(c, *a):
        g = jax.grad(lambda f: dynamic_mask_render(
            f, *a[1:], (Hm, Wm), stride).sum())(a[0] + c * 0)
        return g.ravel()[0].astype(jnp.float32) * 1e-30 + c

    def fb_r(c, *a):
        g = jax.grad(lambda f: render_reference(
            f, *a[1:], hw=(Hm, Wm), stride=stride, dtype=dtype).sum())(
            a[0] + c * 0)
        return g.ravel()[0].astype(jnp.float32) * 1e-30 + c

    chain_time(f"{tag} fwd+bwd pallas", fb_k, *args)
    chain_time(f"{tag} fwd+bwd einsum", fb_r, *args)


if __name__ == "__main__":
    run("eval 10x100x133x125 bf16", 10, 100, 133, 125, jnp.bfloat16)
    run("train 2x100x112x112 bf16", 2, 100, 112, 112, jnp.bfloat16)
    run("bbbc 2x300x130x174 bf16", 2, 300, 130, 174, jnp.bfloat16)
