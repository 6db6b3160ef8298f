"""Benchmark: CVPPP-protocol inference throughput on the local accelerator.

Measures steady-state images/sec of the flagship PCTrans model under the
reference's evaluation protocol (530x500 images, batch 10 — the CVPPP val
loader shape, reference connectomics/data/dataset/build.py:361-362 and
engine/trainer.py:404): jitted forward + mask upsampling + sigmoid, device
time only (the host postprocess runs concurrently in production).

Prints ONE JSON line.  ``vs_baseline``: the reference publishes no
throughput numbers (BASELINE.md); the north-star target is >= 5x a
reference A100 run.  Until a measured A100 denominator exists we report
vs_baseline against a 20 img/s placeholder estimate for the torch reference
(A100, batch 10, AMP) — to be replaced when a measured number lands.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_A100_IMG_PER_SEC = 20.0  # placeholder; see module docstring


def main():
    from pctrans_tpu.models import PCTransModel, ModelConfig
    from pctrans_tpu.ops.resize import resize_bilinear

    B, H, W = 10, 530, 500
    config = ModelConfig()
    model = PCTransModel(config=config, train=False)
    rng = jax.random.key(0)
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 3), jnp.float32)

    variables = jax.jit(model.init)(rng, x[:1])

    @jax.jit
    def eval_step(images):
        out = model.apply(variables, images)
        masks = resize_bilinear(out["pred_masks"], (H, W))
        return jax.nn.sigmoid(masks)

    # warmup / compile
    eval_step(x).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        probs = eval_step(x)
    probs.block_until_ready()
    dt = time.perf_counter() - t0
    img_per_sec = B * iters / dt

    print(json.dumps({
        "metric": "cvppp_inference_throughput",
        "value": round(img_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / REFERENCE_A100_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
