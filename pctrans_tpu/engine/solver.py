"""Optimizer and LR schedules (optax).

Mirrors the reference solver (connectomics/engine/solver/build.py:96-168 and
lr_scheduler.py): AdamW with per-parameter-group weight decay — norm
parameters get ``WEIGHT_DECAY_NORM`` (0), biases ``WEIGHT_DECAY_BIAS`` (0),
everything else ``WEIGHT_DECAY`` — and warmup'd poly/cosine/multistep decay
schedules.  The reference's backbone-multiplier is disabled in its used
``build_optimizer`` (build.py:126-127), so it is not applied here either.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def warmup_factor_at(step, method: str, warmup_iters: int, warmup_factor: float):
    if warmup_iters <= 0:
        return jnp.ones_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if method == "constant":
        wf = jnp.full_like(step, warmup_factor)
    elif method == "linear":
        alpha = step / warmup_iters
        wf = warmup_factor * (1 - alpha) + alpha
    else:
        raise ValueError(method)
    return jnp.where(step >= warmup_iters, 1.0, wf)


def build_lr_schedule(cfg) -> Callable:
    """Returns schedule(step) -> lr, matching the reference schedulers."""
    s = cfg.SOLVER
    base = s.BASE_LR
    total = s.ITERATION_TOTAL
    name = s.LR_SCHEDULER_NAME

    if name == "WarmupPolyLR":
        power = getattr(s, "POLY_POWER", 0.9)

        def sched(step):
            wf = warmup_factor_at(step, s.WARMUP_METHOD, s.WARMUP_ITERS, s.WARMUP_FACTOR)
            frac = jnp.clip(1.0 - jnp.asarray(step, jnp.float32) / total, 0.0, 1.0)
            return base * wf * frac**power

    elif name == "WarmupCosineLR":

        def sched(step):
            wf = warmup_factor_at(step, s.WARMUP_METHOD, s.WARMUP_ITERS, s.WARMUP_FACTOR)
            return base * wf * 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.asarray(step, jnp.float32) / total))

    elif name == "WarmupMultiStepLR":
        steps = tuple(s.STEPS)

        def sched(step):
            wf = warmup_factor_at(step, s.WARMUP_METHOD, s.WARMUP_ITERS, s.WARMUP_FACTOR)
            k = sum(jnp.asarray(step) >= jnp.asarray(m) for m in steps)
            return base * wf * s.GAMMA**k

    else:
        raise ValueError(f"Unsupported LR scheduler: {name}")

    return sched


def _is_norm_or_bias_path(path) -> str:
    """Classify a param path: 'norm' | 'bias' | 'kernel'."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(k) for k in keys).lower()
    leaf = str(keys[-1]).lower()
    if any(t in joined for t in ("norm", "groupnorm", "batchnorm", "bn")) or leaf == "scale":
        return "norm"
    if leaf in ("bias",):
        return "bias"
    return "kernel"


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    s = cfg.SOLVER
    sched = build_lr_schedule(cfg)

    labels = jax.tree_util.tree_map_with_path(lambda p, _: _is_norm_or_bias_path(p), params)

    def adamw(wd):
        return optax.adamw(learning_rate=sched, b1=s.BETAS[0], b2=s.BETAS[1], weight_decay=wd)

    if s.NAME == "AdamW":
        tx = optax.multi_transform(
            {
                "kernel": adamw(s.WEIGHT_DECAY),
                "bias": adamw(s.WEIGHT_DECAY_BIAS),
                "norm": adamw(s.WEIGHT_DECAY_NORM),
            },
            labels,
        )
    elif s.NAME == "Adam":
        tx = optax.adam(learning_rate=sched, b1=s.BETAS[0], b2=s.BETAS[1])
    elif s.NAME == "SGD":
        tx = optax.sgd(learning_rate=sched, momentum=s.MOMENTUM)
    else:
        raise ValueError(f"Unsupported optimizer: {s.NAME}")

    if s.CLIP_GRADIENTS.ENABLED:
        if s.CLIP_GRADIENTS.CLIP_TYPE in ("full_model", "norm"):
            tx = optax.chain(optax.clip_by_global_norm(s.CLIP_GRADIENTS.CLIP_VALUE), tx)
        elif s.CLIP_GRADIENTS.CLIP_TYPE == "value":
            tx = optax.chain(optax.clip(s.CLIP_GRADIENTS.CLIP_VALUE), tx)
    return tx
