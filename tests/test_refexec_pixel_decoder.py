"""Pixel-decoder parity vs the EXECUTED reference MSDeformAttnPixelDecoder.

The reference module runs unmodified from /root/reference; its compiled
CUDA op is stubbed to fail at call time, which routes through the
reference's OWN pure-torch fallback ``ms_deform_attn_core_pytorch``
(ops/modules/ms_deform_attn.py:116-121) — so this also pits the JAX
ms-deform formulation against the reference's published numerics, not a
transcription.

It additionally characterizes the as-published FPN operand swap
(msdeformattn.py:348): the reference computes ``out[-1] +
interpolate(lateral, -> stride-8 size)`` where upstream Mask2Former
computes ``lateral + interpolate(out[-1], -> stride-4 size)``.  With
``fpn_legacy_swap=True`` the flax decoder reproduces the published
behavior bit-for-bit; the default produces the upstream stride-4 fusion.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# slow tier: executed-reference oracles load and run the reference's own
# torch code — run on demand (pytest -m slow / -m "") , not in the
# driver-facing fast tier (see tests/conftest.py tier banner)
pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_exec import load_ref  # noqa: E402

from jit_helpers import jit_apply, jit_init  # noqa: E402

from pctrans_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder  # noqa: E402

D, HEADS, LAYERS, FFN = 32, 4, 2, 64
B = 2
H4, W4 = 32, 24  # res2 (stride 4)
CHANNELS = {"res2": 48, "res3": 64, "res4": 96, "res5": 128}


def _t(a):
    return torch.from_numpy(np.asarray(a)).float()


def _feats(rng):
    return {
        name: rng.randn(B, H4 // (2 ** i), W4 // (2 ** i), c).astype(
            np.float32)
        for i, (name, c) in enumerate(CHANNELS.items())
    }


def build_reference(p, stats):
    mod = load_ref(
        "connectomics.model.maskformer_block.pixel_decoder.msdeformattn")
    ShapeSpec = sys.modules["detectron2.layers"].ShapeSpec
    input_shape = {
        name: ShapeSpec(channels=c, stride=4 * 2 ** i)
        for i, (name, c) in enumerate(CHANNELS.items())
    }
    ref = mod.MSDeformAttnPixelDecoder(
        input_shape=input_shape, transformer_dropout=0.0,
        transformer_nheads=HEADS, transformer_dim_feedforward=FFN,
        transformer_enc_layers=LAYERS, conv_dim=D, mask_dim=8,
        norm="SyncBN", transformer_in_features=["res3", "res4", "res5"],
        common_stride=4)
    ref.eval()

    sd = ref.state_dict()
    for i in range(3):  # input_proj index 0 = res5 (both sides)
        sd[f"input_proj.{i}.0.weight"] = _t(
            p[f"input_proj{i}"]["kernel"]).permute(3, 2, 0, 1).contiguous()
        sd[f"input_proj.{i}.0.bias"] = _t(p[f"input_proj{i}"]["bias"])
        sd[f"input_proj.{i}.1.weight"] = _t(p[f"input_gn{i}"]["scale"])
        sd[f"input_proj.{i}.1.bias"] = _t(p[f"input_gn{i}"]["bias"])
    sd["transformer.level_embed"] = _t(p["level_embed"])
    for i in range(LAYERS):
        lp = p[f"encoder_layer{i}"]
        base = f"transformer.encoder.layers.{i}"
        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            sd[f"{base}.self_attn.{name}.weight"] = _t(
                lp["self_attn"][name]["kernel"]).T.contiguous()
            sd[f"{base}.self_attn.{name}.bias"] = _t(
                lp["self_attn"][name]["bias"])
        for name in ("linear1", "linear2"):
            sd[f"{base}.{name}.weight"] = _t(lp[name]["kernel"]).T.contiguous()
            sd[f"{base}.{name}.bias"] = _t(lp[name]["bias"])
        for name in ("norm1", "norm2"):
            sd[f"{base}.{name}.weight"] = _t(lp[name]["scale"])
            sd[f"{base}.{name}.bias"] = _t(lp[name]["bias"])
    # FPN lateral/output convs (SyncBN -> BatchNorm2d in the stub)
    sd["adapter_1.weight"] = _t(
        p["adapter0"]["Conv_0"]["kernel"]).permute(3, 2, 0, 1).contiguous()
    sd["adapter_1.norm.weight"] = _t(p["adapter0"]["BatchNorm_0"]["scale"])
    sd["adapter_1.norm.bias"] = _t(p["adapter0"]["BatchNorm_0"]["bias"])
    sd["adapter_1.norm.running_mean"] = _t(
        stats["adapter0"]["BatchNorm_0"]["mean"])
    sd["adapter_1.norm.running_var"] = _t(
        stats["adapter0"]["BatchNorm_0"]["var"])
    sd["layer_1.weight"] = _t(
        p["layer0"]["Conv_0"]["kernel"]).permute(3, 2, 0, 1).contiguous()
    sd["layer_1.norm.weight"] = _t(p["layer0"]["BatchNorm_0"]["scale"])
    sd["layer_1.norm.bias"] = _t(p["layer0"]["BatchNorm_0"]["bias"])
    sd["layer_1.norm.running_mean"] = _t(stats["layer0"]["BatchNorm_0"]["mean"])
    sd["layer_1.norm.running_var"] = _t(stats["layer0"]["BatchNorm_0"]["var"])
    ref.load_state_dict(sd, strict=True)
    return ref


def _run_flax(feats, fpn_legacy_swap):
    dec = MSDeformAttnPixelDecoder(
        conv_dim=D, mask_dim=8, transformer_layers=LAYERS, n_heads=HEADS,
        d_ffn=FFN, train=False, fpn_legacy_swap=fpn_legacy_swap)
    jf = {k: jnp.asarray(v) for k, v in feats.items()}
    variables = jit_init(dec, jf)
    variables = jax.tree.map(
        lambda a: a + jnp.asarray(
            np.random.RandomState(a.size % 9973).randn(*a.shape)
            * 0.05).astype(a.dtype),
        variables)
    mask_features, enc_top, multi_scale = jit_apply(dec, variables, jf)
    return variables, mask_features, enc_top, multi_scale


def test_pixel_decoder_matches_executed_reference(rng):
    feats = _feats(rng)
    variables, mask_features, enc_top, multi_scale = _run_flax(
        feats, fpn_legacy_swap=True)
    p = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    ref = build_reference(p, stats)
    with torch.no_grad():
        ref_mask, ref_top, ref_ms = ref.forward_features(
            {k: torch.from_numpy(v).permute(0, 3, 1, 2).contiguous()
             for k, v in feats.items()})

    for lvl, (a, b) in enumerate(zip(multi_scale, ref_ms)):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=3e-4, err_msg=f"multi_scale level {lvl}")
    np.testing.assert_allclose(
        np.asarray(enc_top), ref_top.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=3e-4)
    # the as-published FPN: stride-8 mask features, replicated exactly
    assert ref_mask.shape[-2:] == (H4 // 2, W4 // 2)
    np.testing.assert_allclose(
        np.asarray(mask_features), ref_mask.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=3e-4)


def test_default_fpn_is_upstream_stride4(rng):
    feats = _feats(rng)
    _, mask_features, _, _ = _run_flax(feats, fpn_legacy_swap=False)
    assert mask_features.shape[1:3] == (H4, W4)  # stride-4 fusion
