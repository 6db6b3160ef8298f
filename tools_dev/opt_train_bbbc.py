"""Measure the BBBC-recipe train step (512^2, Q=300, batch 2) on TPU,
remat on vs off, to decide the TPU_RECIPE.REMAT default and record the
train-side number for the reference's second benchmark family."""
import os, sys, time

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

B, S, Q, MAXI = 2, 512, 300, 128
N = 8
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
    print(f"{label:>16}: {dt*1e3:7.1f} ms  ({B/dt:5.1f} img/s)", flush=True)
    return dt


def main():
    cfg = get_cfg_defaults()
    criterion = SetCriterion(CriterionConfig())
    rng = jax.random.key(0)

    ds = SyntheticDataset(size=(S, S), length=B,
                          n_instances=(int(S * S * 1.4e-4), int(S * S * 4.1e-4)),
                          radius_px=(10.0, 22.0))
    items = [ds[i] for i in range(B)]
    batch = {
        "image": jax.device_put(jnp.asarray(np.stack([it["image"] for it in items]))),
        "label": jax.device_put(jnp.asarray(np.stack([it["label"] for it in items]))),
    }

    for remat in (True, False):
        config = ModelConfig(dtype="bfloat16", remat=remat, num_queries=Q)
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
        step = make_train_step(config, criterion, tx, max_instances=MAXI)

        def consume_state(st2):
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.ravel()[0].astype(jnp.float32),
                st2.params, jnp.float32(0.0))

        def full(c, st, img, lab):
            st2, m = step(st, {"image": img + c * 0, "label": lab}, rng)
            return (m["loss"] + consume_state(st2)) * 1e-30 + c

        try:
            chain_time(f"bbbc remat={remat}", full, state, batch["image"],
                       batch["label"])
        except Exception as e:  # noqa: BLE001 — OOM reporting
            print(f"bbbc remat={remat}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
