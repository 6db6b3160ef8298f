"""Isolate the optimizer's device cost and test a flattened formulation.

The train-step trace shows thousands of tiny per-leaf ops (copy-done
f32[128] x579, f32[128,128] x456, multiply/convert reduce fusions) from
clip_by_global_norm + multi_transform{3x adamw} + apply_updates over ~300
param leaves.  On a TPU every HLO has fixed sequencer overhead, so op
COUNT — not bytes — can dominate at these sizes.

Variants, each jitted alone on the real param tree (grads = params-shaped
ones), chained N dispatches:
  chain3   — the shipped chain: clip_by_global_norm + multi_transform of
             3 adamw groups (kernel/bias/norm weight decay).
  masked   — clip + ONE adamw with a weight-decay mask (valid when the
             bias/norm decays are 0 — the reference recipe's case).
  flat     — clip + ONE adamw applied to a SINGLE concatenated f32 vector
             (optax.flatten(masked adamw)): ~10 big ops instead of ~8/leaf.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.engine.solver import build_optimizer, build_lr_schedule, \
    _is_norm_or_bias_path
from pctrans_tpu.engine.state import TrainState
from pctrans_tpu.models import PCTransModel, ModelConfig

N = 20


def time_tx(name, tx, params):
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def upd(opt_state, params, c):
        g = jax.tree_util.tree_map(lambda x: x + c, grads)
        updates, new_state = tx.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        first = jax.tree_util.tree_leaves(new_params)[0]
        return new_state, new_params, first.ravel()[0] * 1e-30

    s, p, c = upd(opt_state, params, jnp.float32(0.0))
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(N):
        s, p, c = upd(s, p, c)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / N * 1e3
    n_leaves = len(jax.tree_util.tree_leaves(opt_state))
    print(f"{name:>8}: {dt:6.2f} ms/update   ({n_leaves} state leaves)",
          flush=True)


def main():
    cfg = get_cfg_defaults()
    config = ModelConfig(dtype="bfloat16", remat=False)
    model = PCTransModel(config=config, train=True)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 448, 448, 3)))
    params = variables["params"]
    nparam = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{nparam/1e6:.1f} M params, "
          f"{len(jax.tree_util.tree_leaves(params))} leaves", flush=True)
    s = cfg.SOLVER
    sched = build_lr_schedule(cfg)

    time_tx("chain3", build_optimizer(cfg, params), params)

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: _is_norm_or_bias_path(p) == "kernel", params)
    masked = optax.chain(
        optax.clip_by_global_norm(s.CLIP_GRADIENTS.CLIP_VALUE),
        optax.adamw(learning_rate=sched, b1=s.BETAS[0], b2=s.BETAS[1],
                    weight_decay=s.WEIGHT_DECAY, mask=decay_mask),
    )
    time_tx("masked", masked, params)

    # optax.adamw == chain(scale_by_adam, add_decayed_weights(mask),
    # scale_by_learning_rate); only the moment update needs the flat view,
    # so the tree mask stays outside the flatten.
    flat = optax.chain(
        optax.clip_by_global_norm(s.CLIP_GRADIENTS.CLIP_VALUE),
        optax.flatten(optax.scale_by_adam(b1=s.BETAS[0], b2=s.BETAS[1])),
        optax.add_decayed_weights(s.WEIGHT_DECAY, mask=decay_mask),
        optax.scale_by_learning_rate(sched),
    )
    time_tx("flat", flat, params)


if __name__ == "__main__":
    main()
