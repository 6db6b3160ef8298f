"""Sanity-check TPU timing: distinct inputs per iter + scalar fetch sync."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pctrans_tpu.engine.state import TrainState, make_eval_step
from pctrans_tpu.models import PCTransModel, ModelConfig


def main():
    print("devices:", jax.devices(), flush=True)
    B, H, W = 10, 530, 500
    config = ModelConfig(dtype="bfloat16")
    model = PCTransModel(config=config, train=False)
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) for _ in range(4)]
    variables = jax.jit(model.init)(jax.random.key(0), xs[0][:1])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None,
    )
    eval_step = jax.jit(make_eval_step(config, top_k=50))
    p, _ = eval_step(state, xs[0])
    p.block_until_ready()

    # per-call timing with scalar fetch (full round trip each call)
    sums = []
    for i in range(8):
        x = xs[i % 4]
        t0 = time.perf_counter()
        p, pk = eval_step(state, x)
        s = float(p.sum())
        dt = time.perf_counter() - t0
        sums.append(s)
        print(f"call {i}: {dt*1000:.1f} ms  sum={s:.1f}", flush=True)
    print("distinct sums:", len(set(sums)), flush=True)

    # pipelined timing (the bench.py pattern)
    t0 = time.perf_counter()
    for i in range(10):
        p, _ = eval_step(state, xs[i % 4])
    p.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"pipelined: {B*10/dt:.1f} img/s ({dt*1000:.1f} ms for 10 calls)", flush=True)


if __name__ == "__main__":
    main()
