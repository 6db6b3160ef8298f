"""Attribute + optimize the train step on TPU (round-3 <90 ms work).

All timings use chained python dispatch with a dependent scalar fetch
(the honest methodology from bench.py; fori-compiled chains of the
while-heavy criterion measure ~3x slower than real dispatch on v5e).

Variants measured:
  full          : the shipped train step (remat on)
  full-noremat  : remat off (BENCH_TRAIN_REMAT lever)
  model-only    : fwd+bwd of the model with a dummy scalar loss (no criterion)
  criterion-fwd : criterion value only, fixed model outputs
  criterion-grad: value_and_grad of the criterion wrt model outputs
  matcher       : the 10-layer vmapped matching alone (fwd, stop-grad)
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.data.synthetic import SyntheticDataset
from pctrans_tpu.data.targets import targets_from_labels
from pctrans_tpu.engine.solver import build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import SetCriterion, CriterionConfig
from pctrans_tpu.losses.matcher import point_matcher_indices
from pctrans_tpu.models import PCTransModel, ModelConfig

B, S = 2, 448
N = 8
RT = 0.030


def chain_time(label, fn, *args, n=N):
    """fn(carry, *args) -> carry (a scalar).  Chained dispatch timing."""
    jfn = jax.jit(fn)
    c = jfn(jnp.float32(0.0), *args)
    float(c)  # compile + warmup
    c = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        c = jfn(c, *args)
    float(c)
    dt = (time.perf_counter() - t0 - RT) / n
    print(f"{label:>16}: {dt*1e3:7.1f} ms", flush=True)
    return dt


def main():
    cfg = get_cfg_defaults()
    criterion = SetCriterion(CriterionConfig())
    rng = jax.random.key(0)

    ds = SyntheticDataset(size=(S, S), length=B)
    items = [ds[i] for i in range(B)]
    batch = {
        "image": jax.device_put(jnp.asarray(np.stack([it["image"] for it in items]))),
        "label": jax.device_put(jnp.asarray(np.stack([it["label"] for it in items]))),
    }

    def build(remat, policy="full"):
        config = ModelConfig(dtype="bfloat16", remat=remat, remat_policy=policy)
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
        return config, model, tx, state

    config, model, tx, state = build(remat=True)
    step = make_train_step(config, criterion, tx, max_instances=40)

    def consume_state(st2):
        # touch every param leaf so the optimizer update cannot be DCE'd
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32),
            st2.params, jnp.float32(0.0))

    def full(c, st, img, lab):
        st2, m = step(st, {"image": img + c * 0, "label": lab}, rng)
        return (m["loss"] + consume_state(st2)) * 1e-30 + c
    chain_time("full(remat)", full, state, batch["image"], batch["label"])

    config0, model0, tx0, state0 = build(remat=False)
    step0 = make_train_step(config0, criterion, tx0, max_instances=40)

    def full0(c, st, img, lab):
        st2, m = step0(st, {"image": img + c * 0, "label": lab}, rng)
        return (m["loss"] + consume_state(st2)) * 1e-30 + c
    chain_time("full(noremat)", full0, state0, batch["image"], batch["label"])

    configd, modeld, txd, stated = build(remat=True, policy="dots")
    stepd = make_train_step(configd, criterion, txd, max_instances=40)

    def fulld(c, st, img, lab):
        st2, m = stepd(st, {"image": img + c * 0, "label": lab}, rng)
        return (m["loss"] + consume_state(st2)) * 1e-30 + c
    chain_time("full(dots)", fulld, stated, batch["image"], batch["label"])

    # ---- model-only fwd+bwd (dummy loss touching every output) ----------
    targets = jax.device_put(
        jax.jit(lambda l: targets_from_labels(l, 40))(batch["label"]))

    def model_loss(params, img, mdl, st):
        out, _ = mdl.apply(
            {"params": params, "frozen": st.frozen,
             "batch_stats": st.batch_stats}, img, mutable=["batch_stats"])
        s = out["pred_masks"].sum() + out["sem_mask"].sum()
        s += sum(m.sum() for m in out["aux_masks"])
        s += out["reference_points"].sum() + out["query_emb"].sum()
        s += out["mask_features"].sum()
        return s.astype(jnp.float32)

    for lbl, mdl, st in (("model-only(rm)", model, state),
                         ("model-only(norm)", model0, state0)):
        def mo(c, p, img, mdl=mdl, st=st):
            g = jax.grad(model_loss)(p, img + c * 0, mdl, st)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.ravel()[0].astype(jnp.float32), g, c * 0) * 1e-30 + c
        chain_time(lbl, mo, st.params, batch["image"])

    # ---- criterion on fixed outputs --------------------------------------
    def fwd(p, x):
        o, _ = model.apply(
            {"params": p, "frozen": state.frozen,
             "batch_stats": state.batch_stats}, x, mutable=["batch_stats"])
        return o
    out = jax.device_put(jax.jit(fwd)(state.params, batch["image"]))

    def crit_val(c, o, t):
        o2 = jax.tree_util.tree_map(lambda v: v + c * 0, o)
        total, _ = criterion(rng, o2, t)
        return total * 1e-30 + c
    chain_time("criterion-fwd", crit_val, out, targets)

    def crit_grad(c, o, t):
        def f(o2):
            total, _ = criterion(rng, o2, t)
            return total
        o1 = jax.tree_util.tree_map(lambda v: v + c * 0, out)
        g = jax.grad(f)(o1)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + x.ravel()[0].astype(jnp.float32), g,
            jnp.float32(0.0)) * 1e-30 + c
    chain_time("criterion-grad", crit_grad, out, targets)

    # ---- matcher alone ----------------------------------------------------
    stacked = jnp.stack(list(out["aux_masks"]) + [out["pred_masks"]])

    def match_only(c, stk, t):
        keys = jax.random.split(rng, stk.shape[0])
        idx = jax.vmap(
            lambda k, p: point_matcher_indices(
                k, (p + c * 0).astype(jnp.bfloat16), t["seg"], t["valid"],
                12544, 5.0, 5.0))(keys, stk)
        return idx.astype(jnp.float32).ravel()[0] * 1e-30 + c
    chain_time("matcher(10L)", match_only, stacked, targets)


if __name__ == "__main__":
    main()
