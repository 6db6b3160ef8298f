"""Device instance postprocess vs the numpy oracle — label-map equality.

The production inference tail (inference/device_postprocess.py) runs every
pixel-scale step on device and only the greedy loops on host; these tests
assert its painted label maps are IDENTICAL to
``instance_inference_cvppp`` / ``_bbbc`` (the numpy oracles, themselves
bit-checked against the executed reference in
tests/test_refexec_postprocess.py) across the regimes that exercise every
branch: duplicate-query clusters, NMS suppression, area filtering, empty
images, and the TOP_K-shaped input the CVPPP eval path actually produces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pctrans_tpu.inference.device_postprocess import (
    DevicePostprocessor,
    _stats,
    pipeline_batches,
)
from pctrans_tpu.inference.postprocess import (
    instance_inference_bbbc,
    instance_inference_cvppp,
)


def _fake_probs(rng, Q=24, H=96, W=80, dup=3):
    """Overlapping duplicate-query stacks (same construction as the refexec
    postprocess test) so clustering, NMS and painting all do real work."""
    from pctrans_tpu.data.synthetic import make_blob_image

    _, label = make_blob_image(rng, size=(H, W), n_instances=(6, 10))
    n = int(label.max())
    probs = np.zeros((Q, H, W), np.float32)
    qi = 0
    for i in range(1, n + 1):
        m = (label == i).astype(np.float32)
        for _ in range(min(dup, Q - qi)):
            noise = rng.rand(H, W).astype(np.float32) * 0.15
            shifted = np.roll(m, rng.randint(-2, 3), axis=rng.randint(2))
            probs[qi] = np.clip(
                shifted * (0.75 + 0.2 * rng.rand()) + noise, 1e-4, 1 - 1e-4)
            qi += 1
    while qi < Q:
        probs[qi] = rng.rand(H, W).astype(np.float32) * 0.3
        qi += 1
    return probs


def _run_device(post, probs_batch, threshold):
    masks = jnp.asarray((probs_batch > threshold).astype(np.uint8))
    areas, inter = _stats(masks)
    return post(masks, np.asarray(areas), np.asarray(inter))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cvppp_matches_numpy_oracle(seed):
    rng = np.random.RandomState(seed)
    probs = np.stack([_fake_probs(rng) for _ in range(2)])
    labels = _run_device(DevicePostprocessor("cvppp"), probs, 0.69)
    for b in range(probs.shape[0]):
        ref = instance_inference_cvppp(probs[b])
        np.testing.assert_array_equal(labels[b], ref)


@pytest.mark.parametrize("seed", [0, 3])
def test_bbbc_matches_numpy_oracle(seed):
    rng = np.random.RandomState(seed)
    probs = np.stack([_fake_probs(rng, Q=30, dup=2) for _ in range(2)])
    labels = _run_device(DevicePostprocessor("bbbc"), probs, 0.05)
    for b in range(probs.shape[0]):
        ref = instance_inference_bbbc(probs[b])
        np.testing.assert_array_equal(labels[b], ref)


def test_empty_and_mixed_batch():
    """An image with zero masks clearing the threshold must paint all
    background while its batchmates paint normally."""
    rng = np.random.RandomState(7)
    real = _fake_probs(rng)
    empty = np.full_like(real, 0.01)
    probs = np.stack([empty, real])
    labels = _run_device(DevicePostprocessor("cvppp"), probs, 0.69)
    assert labels[0].max() == 0
    np.testing.assert_array_equal(labels[1], instance_inference_cvppp(real))


def test_area_filter_only_batch():
    """Masks that clear the threshold but fail area > 40 are dropped."""
    probs = np.zeros((1, 8, 64, 64), np.float32)
    probs[0, 0, :5, :5] = 0.9  # 25 px < 40
    probs[0, 1, 10:20, 10:20] = 0.9  # 100 px
    labels = _run_device(DevicePostprocessor("cvppp"), probs, 0.69)
    np.testing.assert_array_equal(labels[0], instance_inference_cvppp(probs[0]))
    assert labels[0].max() == 1


def test_pipeline_batches_order_and_coverage():
    trace = []

    def stage(name):
        def f(b, v):
            trace.append((name, b))
            return (v or 0) + b
        return f

    out = list(pipeline_batches(range(5), stage("s0"), stage("s1"),
                                stage("s2")))
    assert [b for b, _ in out] == list(range(5))
    assert [r for _, r in out] == [3 * b for b in range(5)]
    # every stage saw every batch, in order, one batch behind the previous
    for name in ("s0", "s1", "s2"):
        assert [b for n, b in trace if n == name] == list(range(5))
    # stage k+1 for batch b runs only after stage k for batch b+1 was
    # dispatched (the one-batch lag that lets async copies land)
    i_s0_b1 = trace.index(("s0", 1))
    i_s1_b0 = trace.index(("s1", 0))
    assert i_s1_b0 > i_s0_b1


def test_eval_step_with_stats_matches_separate():
    """make_eval_step(with_stats=True) returns the same masks plus exact
    packed stats (intersections, areas, peak logits) of those masks."""
    import jax

    from pctrans_tpu.engine.state import TrainState, make_eval_step
    from pctrans_tpu.inference.device_postprocess import unpack_mask_stats
    from pctrans_tpu.models import ModelConfig, PCTransModel

    config = ModelConfig(dtype="float32", num_queries=8)
    model = PCTransModel(config=config, train=False)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       frozen=variables.get("frozen", {}),
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)
    plain = jax.jit(make_eval_step(config, threshold=0.5))
    stats = jax.jit(make_eval_step(config, threshold=0.5, with_stats=True))
    m0, peaks0 = plain(state, x)
    m1, packed = stats(state, x)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    areas, inter, peaks = unpack_mask_stats(np.asarray(packed))
    a_ref, i_ref = (np.asarray(v) for v in _stats(m0))
    np.testing.assert_array_equal(areas, a_ref.astype(np.float32))
    np.testing.assert_array_equal(inter, i_ref.astype(np.float32))
    np.testing.assert_array_equal(peaks, np.asarray(peaks0))
