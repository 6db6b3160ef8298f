"""Train state and the jitted train/eval step factories.

One optimizer step = the reference's Trainer.train() hot path
(engine/trainer.py:113-202) collapsed into a single XLA program: target prep
(prepare_intance_targets), forward, per-layer Hungarian matching, the full
loss stack, backward and the optimizer update all run on device; under a
batch-sharded mesh the gradient all-reduce is implicit (the DDP equivalent).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.targets import targets_from_labels
from ..losses import SetCriterion
from ..models import PCTransModel, ModelConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    frozen: Any
    batch_stats: Any
    opt_state: Any


def init_state(
    rng: jax.Array,
    model_config: ModelConfig,
    tx: optax.GradientTransformation,
    input_shape,
) -> TrainState:
    model = PCTransModel(config=model_config, train=True)
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(
    model_config: ModelConfig,
    criterion: SetCriterion,
    tx: optax.GradientTransformation,
    max_instances: int,
    axis_name: Optional[str] = None,
    input_range: tuple = (0.0, 1.0),
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    ``batch``: {"image": [B, H, W, 3] float32, "label": [B, H, W] int32}.
    Narrow transfer dtypes are widened on device; a uint8 image batch is
    dequantized as ``u8 * (hi-lo)/255 + lo`` with ``(lo, hi)`` =
    ``input_range`` (DATASET.TRANSFER_UINT8 — the trainer packs the host
    side with the matching affine).
    """
    model = PCTransModel(config=model_config, train=True, axis_name=axis_name)
    # idempotent: lets every tx accept the ``value`` extra arg (the loss,
    # consumed by the ReduceLROnPlateau transform, ignored otherwise)
    tx = optax.with_extra_args_support(tx)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        # host batches may arrive in narrow transfer dtypes (f16 images /
        # int16 labels: the trainer halves host->device bytes, which is
        # ~0.2 s/step through this environment's remote-TPU relay); widen
        # on device before any compute
        images = batch["image"]
        if images.dtype == jnp.uint8:
            lo, hi = float(input_range[0]), float(input_range[1])
            images = images.astype(jnp.float32) * ((hi - lo) / 255.0) + lo
        else:
            images = images.astype(jnp.float32)
        labels = batch["label"].astype(jnp.int32)
        targets = targets_from_labels(labels, max_instances)

        has_bn = bool(state.batch_stats)

        def loss_fn(params):
            variables = {"params": params, "frozen": state.frozen}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                out, mut = model.apply(variables, images, mutable=["batch_stats"])
            else:
                out = model.apply(variables, images)
                mut = {}
            total, losses = criterion(step_rng, out, targets)
            return total, (losses, mut)

        (total, (losses, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params,
                                       value=total)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=mut.get("batch_stats", state.batch_stats),
        )
        metrics = {"loss": total, **losses}
        return new_state, metrics

    return train_step


def make_eval_step(model_config: ModelConfig, top_k: Optional[int] = None,
                   threshold: Optional[float] = None,
                   with_stats: bool = False) -> Callable:
    """Returns eval_step(state, images) following the reference protocol
    (arch/maskformer.py:210-219): mask logits upsampled to input resolution,
    then sigmoid.

    With ``top_k`` set, only the K queries with the highest peak logit are
    upsampled — the expensive step: the full upsample writes
    B*Q*H*W floats (~1 GB/batch at CVPPP eval shapes) of which the 0.69
    threshold keeps a handful.  The filter is *exact* for any run where at
    most K queries clear the postprocess threshold: bilinear upsampling is a
    convex combination, so a query's upsampled peak never exceeds its
    stride-4 peak, and queries are kept in score order.  Returns
    (probs [B, K, H, W], peak_logits [B, K]) — callers can verify K was
    large enough by checking peak_logits[:, -1] against the threshold logit.
    Without ``top_k``: probs [B, Q, H, W] (exact reference semantics).

    With ``threshold`` set, masks are binarized ON DEVICE at the postprocess
    threshold (logit-space comparison, exact w.r.t. sigmoid monotonicity)
    and returned as uint8 — every downstream consumer
    (instance_inference_*, mask_post, merge_func) re-thresholds
    ``probs > t`` anyway, and uint8 quarters the device->host transfer
    (~530 MB of f32 per CVPPP eval batch over this environment's relay).

    With ``with_stats`` (requires ``threshold``), the per-mask areas, the
    K x K intersection matrix and the peak logits are computed in the SAME
    program (bf16 MXU matmul, integer-exact) and packed into ONE f32 array
    — the step returns ``(masks_u8, stats [B, K, K+2])`` (unpack with
    ``device_postprocess.unpack_mask_stats``).  The device-resident
    instance postprocess consumes the stats on the host while the masks
    stay on device; one packed array = one landed host fetch per batch.
    """
    if with_stats and threshold is None:
        raise ValueError("with_stats requires a binarize threshold")
    model = PCTransModel(config=model_config, train=False)
    from ..ops.resize import resize_bilinear

    def eval_step(state: TrainState, images: jnp.ndarray):
        # images may arrive in the f16 transfer dtype (halves host->device
        # bytes through the remote-TPU relay, same rule as the train step);
        # widen on device before any compute
        images = images.astype(jnp.float32)
        variables = {"params": state.params, "frozen": state.frozen}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, images)
        masks = out["pred_masks"]  # [B, Q, H/4, W/4] f32 (stride 4)
        H, W = images.shape[1:3]
        if top_k is not None and top_k < masks.shape[1]:
            peak = masks.max(axis=(2, 3))                      # [B, Q]
            top_peak, idx = jax.lax.top_k(peak, top_k)         # [B, K]
            masks = jnp.take_along_axis(masks, idx[:, :, None, None], axis=1)
            peaks = top_peak
        else:
            peaks = masks.max(axis=(2, 3))
        if threshold is not None:
            import math as _math

            from ..ops.resize_pallas import resize_bilinear_binarize

            logit_t = _math.log(threshold / (1.0 - threshold))
            # fused Pallas upsample+binarize: the full-resolution f32
            # logits never touch HBM (868 MB/step at BBBC shapes; the
            # largest eval family after ms-deform — BASELINE.md BBBC
            # roofline).  Off-TPU this dispatches to the plain XLA path.
            masks_bin = resize_bilinear_binarize(masks, (H, W), logit_t)
            if with_stats:
                from ..inference.device_postprocess import packed_mask_stats

                return masks_bin, packed_mask_stats(masks_bin, extra=peaks)
            return masks_bin, peaks.astype(jnp.float32)
        masks = resize_bilinear(masks, (H, W))
        # full-probability protocol output is f32 regardless of the model
        # compute dtype (host metric consumers expect numpy float32)
        return jax.nn.sigmoid(masks).astype(jnp.float32), \
            peaks.astype(jnp.float32)

    return eval_step
