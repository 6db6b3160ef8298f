"""Benchmark: CVPPP-protocol inference throughput on the local accelerator.

Measures steady-state images/sec of the flagship PCTrans model under the
reference's evaluation protocol (530x500 images, batch 10 — the CVPPP val
loader shape, reference connectomics/data/dataset/build.py:361-362 and
engine/trainer.py:404): jitted forward + top-k mask upsampling + sigmoid.
The compute path matches the production recipe: bf16 activations
(MODEL.MIXED_PRECESION — the reference trains/evals under AMP,
engine/trainer.py:140) and INFERENCE.TOP_K=50 lean mask upsampling (exact
w.r.t. the 0.69-threshold protocol; see engine/state.make_eval_step).

Timing methodology: N iterations run *inside one jitted fori_loop* with a
scalar data dependency between them, and a single scalar is fetched at the
end.  This measures pure device time.  (Through this environment's remote
TPU relay, ``block_until_ready`` returns before remote execution completes,
so the usual dispatch-loop timing under-reports by orders of magnitude —
round 1's 6.1 img/s was actually tunnel/sync overhead and the same loop
with an honest sync measured inflated throughput.)

Also measures the training step (448x448 crops, batch 2/device — the
reference per-GPU recipe, README.md:30-34) the same way and reports it as
``train_img_per_sec`` in the same JSON line.

Prints ONE JSON line.  ``vs_baseline``: the reference publishes no
throughput numbers (BASELINE.md); the north-star target is >= 5x a
reference A100 run on a v5e-8.  The denominator is the documented estimate
in BASELINE.md "Reference denominator" (Mask2Former R50 published V100 fps,
scaled by pixel count / batch amortization / A100 ratio) — replace
``REFERENCE_A100_IMG_PER_SEC`` when a measured number lands.  The line also
reports XLA-counted ``gflops_per_image`` and ``mfu`` against the device's
bf16 peak so the throughput claim is auditable without the denominator.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference A100 denominator: the reference repo publishes no throughput and
# cannot run in this image (no CUDA/detectron2).  BASELINE.md "Reference
# denominator" derives a defensible estimate from the published Mask2Former
# R50 V100 fps scaled by pixel count, batch-10 amortization and A100/V100
# ratio: ~40-80 img/s; we anchor at the midpoint.  The >=5x north star is
# defined against a TPU v5e-8 (8 chips); eval is data-parallel, so the
# platform number is ~8x the single-chip throughput measured here.
REFERENCE_A100_IMG_PER_SEC = 60.0  # estimated; basis in BASELINE.md
ROUND_TRIP_S = 0.030               # measured host<->TPU relay round trip

# bf16 MXU peak by device kind, TFLOP/s (public TPU specs)
_PEAK_TFLOPS = {"v4": 275.0, "v5 lite": 197.0, "v5e": 197.0,
                "v5p": 459.0, "v6 lite": 918.0, "v6e": 918.0}


def _device_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 197.0  # assume v5e-class


def _xla_flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _timed_loop(loop_fn, n_iters: int) -> float:
    """Run jitted loop_fn(scalar)->scalar twice (compile, measure); returns
    seconds per iteration of pure device time."""
    float(loop_fn(jnp.float32(0.0)))  # warmup/compile
    t0 = time.perf_counter()
    float(loop_fn(jnp.float32(0.0)))
    return max(time.perf_counter() - t0 - ROUND_TRIP_S, 1e-9) / n_iters


def bench_inference(dtype: str = "bfloat16", top_k: int = 50, iters: int = 10):
    from pctrans_tpu.engine.state import TrainState, make_eval_step
    from pctrans_tpu.models import PCTransModel, ModelConfig

    B, H, W = 10, 530, 500
    config = ModelConfig(dtype=dtype)
    model = PCTransModel(config=config, train=False)
    x = jax.device_put(jnp.asarray(np.random.RandomState(0).randn(B, H, W, 3), jnp.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None,
    )
    eval_step = make_eval_step(config, top_k=top_k)

    # XLA-counted FLOPs of one eval step.  The Pallas ms-deform kernel is a
    # custom call XLA counts as zero, so its matmul FLOPs are added
    # analytically (stage-1 separable contraction, 2*B*M*Lq*P*D*S per
    # encoder layer; see ops/msdeform_pallas2.py).
    flops = _xla_flops(jax.jit(eval_step).lower(state, x).compile())
    # the correction applies only where 'auto' actually picks the Pallas
    # kernel; off-TPU the XLA matmul path is already counted
    if flops and jax.default_backend() == "tpu":
        # per layer: sum_l 2*B*M*(Lq*P)*W_l*(H_l*D) = 2*B*M*Lq*P*D*S, Lq == S
        M, D, P, layers = 8, 16, 4, 6
        S = sum(-(-H // s) * -(-W // s) for s in (8, 16, 32))
        flops += 2.0 * B * M * S * P * D * S * layers

    @jax.jit
    def loop(c):
        def body(i, c):
            probs, _ = eval_step(state, x + c * 0)
            return probs.ravel()[0] * 1e-30 + c

        return jax.lax.fori_loop(0, iters, body, c)

    dt = _timed_loop(loop, iters)
    return B / dt, flops / B if flops else None, dt


def bench_train(dtype: str = "bfloat16", iters: int = 5):
    from pctrans_tpu.config import get_cfg_defaults
    from pctrans_tpu.data.synthetic import SyntheticDataset
    from pctrans_tpu.engine.solver import build_optimizer
    from pctrans_tpu.engine.state import TrainState, make_train_step
    from pctrans_tpu.losses import SetCriterion, CriterionConfig
    from pctrans_tpu.models import PCTransModel, ModelConfig

    B, S = 2, 448
    cfg = get_cfg_defaults()
    config = ModelConfig(dtype=dtype)
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
    step = jax.jit(make_train_step(config, criterion, tx, max_instances=40))
    rng = jax.random.key(0)

    # XLA-counted FLOPs of one train step (fwd+bwd+optimizer).  Unlike eval,
    # no analytic correction: the train path dispatches ms-deform to the XLA
    # hat-matmul (impl='auto_train', ops/msdeform.py — fused fwd+bwd wins
    # under AD), whose dots cost_analysis already counts.
    flops = _xla_flops(step.lower(state, batch, rng).compile())

    # Python-loop dispatch with a dependent final scalar fetch: each step
    # consumes the previous state, so the chain serializes on device, and
    # float() blocks on the value (unlike block_until_ready through the
    # remote relay).  A fori_loop-compiled chain measured ~3x slower than
    # the plain jitted step on v5e (XLA schedules the while-heavy criterion
    # worse inside an outer loop), so it would under-report real training.
    st, m = step(state, batch, rng)   # compile + warmup
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = step(st, batch, rng)
    float(m["loss"])                  # waits for the whole chain
    dt = max(time.perf_counter() - t0 - ROUND_TRIP_S, 1e-9) / iters
    return B / dt, (flops / B if flops else None)


def main():
    img_per_sec, flops_per_img, _ = bench_inference()
    try:
        train_ips, train_flops_per_img = bench_train()
    except Exception:
        train_ips, train_flops_per_img = None, None

    out = {
        "metric": "cvppp_inference_throughput",
        "value": round(img_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / REFERENCE_A100_IMG_PER_SEC, 3),
        "vs_baseline_basis": (
            "estimated A100 %.0f img/s (BASELINE.md 'Reference denominator'); "
            "north star is v5e-8, ~8x this single-chip number"
            % REFERENCE_A100_IMG_PER_SEC),
    }
    if flops_per_img:
        peak = _device_peak_tflops() * 1e12
        out["gflops_per_image"] = round(flops_per_img / 1e9, 1)
        out["mfu"] = round(flops_per_img * img_per_sec / peak, 4)
    if train_ips is not None:
        out["train_img_per_sec"] = round(train_ips, 3)
        if train_flops_per_img:
            peak = _device_peak_tflops() * 1e12
            out["train_gflops_per_image"] = round(train_flops_per_img / 1e9, 1)
            out["train_mfu"] = round(
                train_flops_per_img * train_ips / peak, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
