"""R-50 detectron2 checkpoint conversion round-trip on a synthetic pickle."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pctrans_tpu.models.resnet import ResNet, convert_d2_r50_pickle


def make_fake_d2_r50(rng, path):
    """Write a synthetic detectron2-format R-50 pickle (correct names/shapes)."""
    weights = {}

    def bn(name, c):
        weights[name + ".norm.weight"] = rng.randn(c).astype(np.float32)
        weights[name + ".norm.bias"] = rng.randn(c).astype(np.float32)
        weights[name + ".norm.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        weights[name + ".norm.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5

    def conv(name, cout, cin, k):
        weights[name + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        bn(name, cout)

    conv("stem.conv1", 64, 3, 7)
    blocks = [3, 4, 6, 3]
    in_ch = 64
    out_ch = 256
    for s, nb in enumerate(blocks):
        stage = f"res{s+2}"
        mid = out_ch // 4
        for b in range(nb):
            name = f"{stage}.{b}"
            if b == 0:
                conv(f"{name}.shortcut", out_ch, in_ch, 1)
            conv(f"{name}.conv1", mid, in_ch if b == 0 else out_ch, 1)
            conv(f"{name}.conv2", mid, mid, 3)
            conv(f"{name}.conv3", out_ch, mid, 1)
        in_ch = out_ch
        out_ch *= 2
    with open(path, "wb") as f:
        pickle.dump({"model": weights, "__author__": "synthetic"}, f)
    return weights


def test_convert_and_apply(tmp_path, rng):
    path = str(tmp_path / "R-50.pkl")
    raw = make_fake_d2_r50(rng, path)
    params, frozen = convert_d2_r50_pickle(path)

    # kernel layout converted OIHW -> HWIO
    w = np.asarray(params["stem_conv1"]["kernel"])
    assert w.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(w[:, :, 0, 5], raw["stem.conv1.weight"][5, 0], rtol=1e-6)

    model = ResNet(norm="FrozenBN", train=False)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ref_vars = jax.eval_shape(model.init, jax.random.key(0), x)
    # converted trees must structurally match the module's own params
    conv_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    init_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_vars["params"])
    assert conv_shapes == init_shapes
    frozen_shapes = jax.tree_util.tree_map(lambda a: a.shape, frozen)
    init_frozen = jax.tree_util.tree_map(lambda a: a.shape, ref_vars["frozen"])
    assert frozen_shapes == init_frozen

    out = jax.jit(model.apply)({"params": params, "frozen": frozen}, x)
    assert out["res5"].shape == (1, 2, 2, 2048)
    assert np.isfinite(np.asarray(out["res5"])).all()
