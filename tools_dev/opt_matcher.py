"""Decompose the 10-layer matcher cost on TPU: point sampling vs LAP solve."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.ops.lap import match_padded, solve_lap
from pctrans_tpu.ops.point_sample import point_sample, sample_label_onehot
from pctrans_tpu.losses.matcher import _pair_costs

L, B, Q, G, P = 10, 2, 100, 40, 12544
h, w, H, W = 112, 112, 448, 448
N = 8
RT = 0.030
rng = np.random.RandomState(0)


def chain_time(label, fn, *args, n=N):
    jfn = jax.jit(fn)
    float(jfn(jnp.float32(0.0), *args))
    c = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        c = jfn(c, *args)
    float(c)
    dt = (time.perf_counter() - t0 - RT) / n
    print(f"{label:>24}: {dt*1e3:7.1f} ms", flush=True)
    return dt


pred = jnp.asarray(rng.randn(L, B, Q, h, w), jnp.bfloat16)
seg = jnp.asarray((rng.rand(B, H, W) * 20).astype(np.int32))
valid = jnp.asarray(np.arange(G)[None, :] < 20).repeat(B, 0)
key = jax.random.key(0)

# full matcher pipeline per (L, B): sample + cost + LAP
coords = jax.random.uniform(key, (L, B, 1, P, 2))


def sample_and_cost(c, pr, sg):
    def one(pred_lb, coords_lb, seg_b, valid_b):
        out_pts = point_sample(pred_lb[None] + c * 0, coords_lb)[0]
        tgt_pts = sample_label_onehot(seg_b[None], coords_lb, G)[0]
        return _pair_costs(out_pts, tgt_pts.astype(pred_lb.dtype), 5.0, 5.0)
    f = jax.vmap(jax.vmap(one, in_axes=(0, 0, 0, 0)), in_axes=(0, 0, None, None))
    cost = f(pr, coords, sg, valid)
    return cost.ravel()[0] * 1e-30 + c


chain_time("sample+cost (20x)", sample_and_cost, pred, seg)

cost_fix = jnp.asarray(rng.rand(L, B, Q, G), jnp.float32)


def lap_only(c, cm):
    f = jax.vmap(jax.vmap(match_padded, in_axes=(0, 0)), in_axes=(0, None))
    idx = f(cm + c * 0, valid)
    return idx.astype(jnp.float32).ravel()[0] * 1e-30 + c


chain_time("LAP only (20x)", lap_only, cost_fix)

# LAP with realistic (structured) costs: random costs make Dijkstra paths
# short; trained-model costs have near-duplicate queries -> longer paths
cost_dup = jnp.repeat(cost_fix[:, :, :50, :], 2, axis=2) + 0.001 * cost_fix
chain_time("LAP only (dup rows)", lap_only, cost_dup)


# auction alternative at the identical train shape (round-3 verdict item 5:
# record both numbers in BASELINE.md; ship the faster)
def lap_auction(c, cm):
    f = jax.vmap(jax.vmap(
        lambda m, v: match_padded(m, v, solver="auction"),
        in_axes=(0, 0)), in_axes=(0, None))
    idx = f(cm + c * 0, valid)
    return idx.astype(jnp.float32).ravel()[0] * 1e-30 + c


chain_time("LAP auction (20x)", lap_auction, cost_fix, n=2)
chain_time("LAP auction (dup rows)", lap_auction, cost_dup, n=2)
