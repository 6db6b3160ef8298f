"""Separate device compute from tunnel sync: time eval_step, sum, fetch."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pctrans_tpu.engine.state import TrainState, make_eval_step
from pctrans_tpu.models import PCTransModel, ModelConfig


def timed(label, fn, n=5):
    # warmup
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1000:.2f} ms", flush=True)
    return out


def main():
    B, H, W = 10, 530, 500
    config = ModelConfig(dtype="bfloat16")
    model = PCTransModel(config=config, train=False)
    rng = np.random.RandomState(0)
    xs = [jax.device_put(jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)) for _ in range(2)]
    jax.block_until_ready(xs)
    variables = jax.jit(model.init)(jax.random.key(0), xs[0][:1])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None,
    )
    eval_step = jax.jit(make_eval_step(config, top_k=50))

    @jax.jit
    def step_and_reduce(state, x):
        p, pk = eval_step(state, x)
        return p.sum()

    i = [0]

    def run_block():
        x = xs[i[0] % 2]; i[0] += 1
        p, _ = eval_step(state, x)
        jax.block_until_ready(p)
        return p

    def run_reduce_fetch():
        x = xs[i[0] % 2]; i[0] += 1
        return float(step_and_reduce(state, x))

    timed("eval_step + block_until_ready", run_block, n=10)
    timed("eval_step+sum fused, float() fetch", run_reduce_fetch, n=5)

    # host->device transfer cost of one input batch
    h = np.asarray(rng.randn(B, H, W, 3), np.float32)
    def put():
        d = jax.device_put(h)
        jax.block_until_ready(d)
        return d
    timed("device_put 32MB input", put, n=3)

    # device->host fetch of the probs output
    p, _ = eval_step(state, xs[0])
    jax.block_until_ready(p)
    timed("fetch probs (530MB) to host", lambda: np.asarray(p), n=2)


if __name__ == "__main__":
    main()
