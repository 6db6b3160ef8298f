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


def make_fake_zoo_r50(rng, path):
    """Write a synthetic Caffe2-format R-50.pkl with the REAL model-zoo key
    manifest (detectron2://ImageNetPretrained/MSRA/R-50.pkl — the file the
    reference's MODEL.WEIGHTS points at, CVPPP-PCTrans-Base.yaml:27):
    conv1_w / res_conv1_bn_s / res{2..5}_{i}_branch{1,2a,2b,2c}_w with
    _bn_s/_bn_b affine pairs, a fc1000 classifier head, NO running stats."""
    weights = {}

    def conv(name, cout, cin, k):
        weights[name + "_w"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        weights[name + "_bn_s"] = rng.rand(c).astype(np.float32) + 0.5
        weights[name + "_bn_b"] = rng.randn(c).astype(np.float32) * 0.1

    conv("conv1", 64, 3, 7)
    weights["res_conv1_bn_s"] = rng.rand(64).astype(np.float32) + 0.5
    weights["res_conv1_bn_b"] = rng.randn(64).astype(np.float32) * 0.1
    in_ch, out_ch = 64, 256
    for s, nb in enumerate([3, 4, 6, 3]):
        mid = out_ch // 4
        for b in range(nb):
            base = f"res{s + 2}_{b}"
            if b == 0:
                conv(f"{base}_branch1", out_ch, in_ch, 1)
                bn(f"{base}_branch1", out_ch)
            conv(f"{base}_branch2a", mid, in_ch if b == 0 else out_ch, 1)
            bn(f"{base}_branch2a", mid)
            conv(f"{base}_branch2b", mid, mid, 3)
            bn(f"{base}_branch2b", mid)
            conv(f"{base}_branch2c", out_ch, mid, 1)
            bn(f"{base}_branch2c", out_ch)
        in_ch, out_ch = out_ch, out_ch * 2
    weights["fc1000_w"] = rng.randn(1000, 2048).astype(np.float32) * 0.01
    weights["fc1000_b"] = rng.randn(1000).astype(np.float32) * 0.01
    with open(path, "wb") as f:
        pickle.dump({"model": weights, "__author__": "Caffe2",
                     "matching_heuristics": True}, f)
    return weights


def test_convert_zoo_caffe2_manifest(tmp_path, rng):
    """The real-zoo Caffe2 key layout converts, loads, and runs: BGR conv1
    flip, absorbed BN stats (mean 0 / var 1-eps), fc1000 dropped."""
    path = str(tmp_path / "R-50.pkl")
    raw = make_fake_zoo_r50(rng, path)
    params, frozen = convert_d2_r50_pickle(path)

    # conv1: OIHW -> HWIO with the BGR->RGB input-channel flip
    w = np.asarray(params["stem_conv1"]["kernel"])
    assert w.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(w[:, :, 0, 5], raw["conv1_w"][5, 2], rtol=1e-6)
    np.testing.assert_allclose(w[:, :, 2, 5], raw["conv1_w"][5, 0], rtol=1e-6)
    # ...and unflipped when replicating the as-published reference behavior
    params_bgr, _ = convert_d2_r50_pickle(path, conv1_bgr_to_rgb=False)
    np.testing.assert_allclose(
        np.asarray(params_bgr["stem_conv1"]["kernel"])[:, :, 0, 5],
        raw["conv1_w"][5, 0], rtol=1e-6)

    # absorbed running stats: folded scale == stored affine weight exactly
    stem_bn = frozen["FrozenBatchNorm_0"]
    np.testing.assert_allclose(np.asarray(stem_bn["mean"]), 0.0)
    np.testing.assert_allclose(
        np.asarray(stem_bn["scale"])
        / np.sqrt(np.asarray(stem_bn["var"]) + 1e-5),
        raw["res_conv1_bn_s"], rtol=1e-6)
    # branch mapping: 2a->conv1, 2b->conv2, 2c->conv3, 1->shortcut
    np.testing.assert_allclose(
        np.asarray(params["res3_block0"]["shortcut"]["kernel"]).transpose(3, 2, 0, 1),
        raw["res3_0_branch1_w"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["res4_block2"]["conv2"]["kernel"]).transpose(3, 2, 0, 1),
        raw["res4_2_branch2b_w"], rtol=1e-6)

    model = ResNet(norm="FrozenBN", train=False)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ref_vars = jax.eval_shape(model.init, jax.random.key(0), x)
    conv_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    init_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_vars["params"])
    assert conv_shapes == init_shapes
    frozen_shapes = jax.tree_util.tree_map(lambda a: a.shape, frozen)
    init_frozen = jax.tree_util.tree_map(lambda a: a.shape, ref_vars["frozen"])
    assert frozen_shapes == init_frozen
    out = jax.jit(model.apply)({"params": params, "frozen": frozen}, x)
    assert out["res5"].shape == (1, 2, 2, 2048)
    assert np.isfinite(np.asarray(out["res5"])).all()
