"""Decompose the production train-LOOP rate (not the step) through the relay.

The round-3 full-recipe run averaged 0.22-0.31 s/iteration while the step's
device span is ~40 ms: the gap is host->device batch transfer (~2.8 MB/step
of f16 images + int16 labels through a ~15-25 MB/s relay) plus per-dispatch
relay latency.  This script measures each candidate fix on the REAL train
step at the recipe shape (448^2, B=2, bf16, no-remat):

  A. staged   — one device-resident batch reused; chained dispatch.  The
                dispatch+compute floor (no transfer at all).
  B. f16      — per-step device_put of f16 images + int16 labels (what
                trainer.train ships today).
  C. u8       — per-step device_put of uint8 images + uint8 labels (the
                train step widens on device; synthetic/PNG sources are
                uint8-natured, so the quantization is the source's own).
  D. f16+buf  — B with the NEXT batch's device_put issued before blocking
                on the current step (double buffering: does the relay
                overlap transfers with compute?).
  E. u8+buf   — C + double buffering.
  F. scan8    — 8 steps fused into one lax.scan dispatch over a device-
                staged [8,...] batch stack (amortizes relay dispatch
                latency; transfer excluded like A — read with A's floor).

Run alone (single relay client): python tools_dev/opt_train_loop.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.data.synthetic import SyntheticDataset
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import SetCriterion, CriterionConfig
from pctrans_tpu.models import PCTransModel, ModelConfig

B, S, N = 2, 448, 20

# optional argv filter: run only the named variants (e.g.
#   python tools_dev/opt_train_loop.py scan8+u8 staged)
ONLY = set(sys.argv[1:])


def want(name: str) -> bool:
    return not ONLY or name in ONLY


def main():
    cfg = get_cfg_defaults()
    config = ModelConfig(dtype="bfloat16", remat=False)
    criterion = SetCriterion(CriterionConfig())
    model = PCTransModel(config=config, train=True)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, S, S, 3)))
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    ds = SyntheticDataset(size=(S, S), length=max(N, 8))
    items = [ds[i] for i in range(max(N, 8))]
    imgs = np.stack([it["image"] for it in items[:B]])      # [B,H,W,3] f32
    labs = np.stack([it["label"] for it in items[:B]])      # [B,H,W] int
    host = {
        "f16": ({"image": imgs.astype(np.float16),
                 "label": labs.astype(np.int16)}),
        "u8": ({"image": (np.clip(imgs, 0, 1) * 255).astype(np.uint8),
                "label": labs.astype(np.uint8)}),
    }
    for k, b in host.items():
        nbytes = sum(v.nbytes for v in b.values())
        print(f"{k}: {nbytes/1e6:.2f} MB/step", flush=True)

    step = jax.jit(make_train_step(config, criterion, tx, max_instances=40))
    rng = jax.random.key(0)
    staged = {k: jax.device_put(v) for k, v in host["f16"].items()}
    st, m = step(state, staged, rng)
    float(m["loss"])  # compile + warmup (f16/int16 program)
    st_u8, m = step(state, {k: jax.device_put(v) for k, v in host["u8"].items()}, rng)
    float(m["loss"])  # compile the uint8-input program variant

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) / N
        print(f"{name:>8}: {dt*1e3:7.1f} ms/step  ({B/dt:5.1f} img/s)",
              flush=True)
        return dt

    # A. staged (no transfer)
    def run_staged():
        s = st
        for _ in range(N):
            s, mm = step(s, staged, rng)
        float(mm["loss"])
    if want("staged"):
        timed("staged", run_staged)

    # B/C. fresh device_put per step
    def run_fresh(kind):
        def f():
            s = st
            for _ in range(N):
                b = {k: jax.device_put(v) for k, v in host[kind].items()}
                s, mm = step(s, b, rng)
            float(mm["loss"])
        return f
    if want("f16"):
        timed("f16", run_fresh("f16"))
    if want("u8"):
        timed("u8", run_fresh("u8"))

    # D/E. double-buffered: put batch i+1 before blocking on step i
    def run_buffered(kind):
        def f():
            s = st
            nxt = {k: jax.device_put(v) for k, v in host[kind].items()}
            for _ in range(N):
                cur, nxt = nxt, {k: jax.device_put(v)
                                 for k, v in host[kind].items()}
                s, mm = step(s, cur, rng)
            float(mm["loss"])
        return f
    if want("f16+buf"):
        timed("f16+buf", run_buffered("f16"))
    if want("u8+buf"):
        timed("u8+buf", run_buffered("u8"))

    # F. 8-step scan over a device-staged batch stack (dispatch amortization)
    K = 8
    stack = {
        "image": jax.device_put(np.stack(
            [np.stack([it["image"] for it in items[i * B:(i + 1) * B]])
             for i in range(K)]).astype(np.float16)),
        "label": jax.device_put(np.stack(
            [np.stack([it["label"] for it in items[i * B:(i + 1) * B]])
             for i in range(K)]).astype(np.int16)),
    }

    @jax.jit
    def scan_steps(s, stack, rng):
        def body(s, b):
            s, mm = step_fn(s, b, rng)
            return s, mm["loss"]
        return jax.lax.scan(body, s, stack)

    step_fn = make_train_step(config, criterion, tx, max_instances=40)
    reps = max(N // K, 1)
    if want("scan8"):
        s2, losses = scan_steps(st, stack, rng)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        s3 = st
        for _ in range(reps):
            s3, losses = scan_steps(s3, stack, rng)
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / (reps * K)
        print(f"{'scan8':>8}: {dt*1e3:7.1f} ms/step  ({B/dt:5.1f} img/s)",
              flush=True)

    # G. scan8 + fresh uint8 stack transfer per dispatch (the production
    # candidate: K-step fusion with narrow host->device bytes)
    if not want("scan8+u8"):
        return
    host_stack_u8 = {
        "image": np.clip(np.stack(
            [np.stack([it["image"] for it in items[i * B:(i + 1) * B]])
             for i in range(K)]) * 255, 0, 255).astype(np.uint8),
        "label": np.stack(
            [np.stack([it["label"] for it in items[i * B:(i + 1) * B]])
             for i in range(K)]).astype(np.uint8),
    }
    nbytes = sum(v.nbytes for v in host_stack_u8.values())
    print(f"u8 stack: {nbytes/1e6:.2f} MB / {K} steps", flush=True)
    s4, losses = scan_steps(st, {k: jax.device_put(v)
                                 for k, v in host_stack_u8.items()}, rng)
    jax.block_until_ready(losses)  # compile the u8-input scan program
    t0 = time.perf_counter()
    s5 = st
    for _ in range(reps):
        s5, losses = scan_steps(
            s5, {k: jax.device_put(v) for k, v in host_stack_u8.items()}, rng)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / (reps * K)
    print(f"{'scan8+u8':>8}: {dt*1e3:7.1f} ms/step  ({B/dt:5.1f} img/s)",
          flush=True)


if __name__ == "__main__":
    main()
