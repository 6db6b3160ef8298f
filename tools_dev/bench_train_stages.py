"""Attribute train-step time on TPU: forward, criterion, matcher, grad."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.data.synthetic import SyntheticDataset
from pctrans_tpu.data.targets import targets_from_labels
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import SetCriterion, CriterionConfig
from pctrans_tpu.models import PCTransModel, ModelConfig

B, S = 2, 448
N = 3
RT = 0.030


def timed(label, fn, *args, n=N):
    @jax.jit
    def loop(c, *a):
        def body(i, c):
            out = fn(c, *a)
            return out * 1e-30 + c
        return jax.lax.fori_loop(0, n, body, c)
    float(loop(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    float(loop(jnp.float32(0.0), *args))
    print(f"{label}: {((time.perf_counter()-t0-RT)/n)*1000:.1f} ms", flush=True)


def main():
    cfg = get_cfg_defaults()
    config = ModelConfig(dtype="bfloat16")
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
    ds = SyntheticDataset(size=(S, S), length=B)
    items = [ds[i] for i in range(B)]
    batch = {
        "image": jax.device_put(jnp.asarray(np.stack([it["image"] for it in items]))),
        "label": jax.device_put(jnp.asarray(np.stack([it["label"] for it in items]))),
    }
    targets = jax.jit(lambda l: targets_from_labels(l, 40))(batch["label"])
    targets = jax.device_put(targets)
    def fwd(p, x):
        o, _ = model.apply(
            {"params": p, "frozen": state.frozen, "batch_stats": state.batch_stats},
            x, mutable=["batch_stats"])
        return o
    out = jax.jit(fwd)(state.params, batch["image"])
    out = jax.device_put(out)
    rng = jax.random.key(0)

    timed("forward only", lambda c, p, img: fwd(
        p, img + c * 0)["pred_masks"].ravel()[0], state.params, batch["image"])

    timed("criterion only (fixed outputs)", lambda c, o, t: criterion(
        rng, {k: (v if not isinstance(v, jnp.ndarray) else v + c * 0)
              if not isinstance(v, list) else [vi + c * 0 for vi in v]
              for k, v in o.items()}, t)[0], out, targets)

    from pctrans_tpu.losses.matcher import point_matcher_indices
    timed("one matcher call (final layer)", lambda c, pm, t: point_matcher_indices(
        rng, pm + c * 0, t["masks"], t["valid"],
        12544, 5.0, 5.0).astype(jnp.float32).ravel()[0], out["pred_masks"], targets, n=3)

    step = make_train_step(config, criterion, tx, max_instances=40)

    def one_step(c, st0, img, lab):
        st, m = step(st0, {"image": img + c * 0, "label": lab}, rng)
        return m["loss"]
    timed("FULL train step", one_step, state, batch["image"], batch["label"], n=3)


if __name__ == "__main__":
    main()
