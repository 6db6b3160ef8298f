"""Shape and sanity tests for the model stack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pctrans_tpu.models import PCTransModel, ModelConfig
from pctrans_tpu.models.resnet import ResNet
from pctrans_tpu.models.layers import position_embedding_sine, gen_sineembed_for_position
from pctrans_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

TINY = ModelConfig(
    hidden_dim=32, conv_dim=32, mask_dim=8, num_queries=10, nheads=4,
    dim_feedforward=64, enc_layers=1, dec_layers=3, head_norm="GN",
)


class TestResNet:
    def test_feature_strides(self):
        model = ResNet(norm="FrozenBN", train=False)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = jax.jit(model.init)(jax.random.key(0), x)
        out = jax.jit(model.apply)(vars_, x)
        assert out["res2"].shape == (1, 16, 16, 256)
        assert out["res3"].shape == (1, 8, 8, 512)
        assert out["res4"].shape == (1, 4, 4, 1024)
        assert out["res5"].shape == (1, 2, 2, 2048)

    def test_odd_input_sizes_match_torch_conv_arithmetic(self):
        # torch floor arithmetic: 530 -> 265 -> 133 (pool) -> res3 67 -> 34 -> 17
        model = ResNet(norm="FrozenBN", train=False)
        x = jnp.zeros((1, 530, 500, 3))
        vars_ = jax.eval_shape(model.init, jax.random.key(0), x)
        out = jax.eval_shape(model.apply, vars_, x)
        assert out["res2"].shape[1:3] == (133, 125)
        assert out["res3"].shape[1:3] == (67, 63)
        assert out["res4"].shape[1:3] == (34, 32)
        assert out["res5"].shape[1:3] == (17, 16)

    def test_torch_stage_sizes(self):
        model = ResNet(norm="FrozenBN", train=False)
        x = jnp.zeros((1, 106, 100, 3))
        vars_ = jax.eval_shape(model.init, jax.random.key(0), x)
        out = jax.eval_shape(model.apply, vars_, x)
        # torch: conv7/2: floor((106+6-7)/2)+1=53; pool3/2: floor((53+2-3)/2)+1=27
        assert out["res2"].shape[1:3] == (27, 25)
        assert out["res5"].shape[1:3] == (4, 4)


class TestPositionEmbedding:
    def test_matches_reference_formula(self):
        # independent recomputation of the DETR sine embedding
        h, w, npf = 5, 7, 16
        pe = np.asarray(position_embedding_sine(h, w, npf))
        assert pe.shape == (h, w, 2 * npf)
        import math
        scale = 2 * math.pi
        y = (np.arange(1, h + 1)[:, None] / (h + 1e-6) * scale)
        dim_t = 10000 ** (2 * (np.arange(npf) // 2) / npf)
        py = y[:, :, None] / dim_t if False else (np.broadcast_to(y[:, :, None], (h, 1, npf)) / dim_t)
        # spot check one position/frequency
        assert pe[2, 3, 0] == pytest.approx(np.sin((3 / (h + 1e-6)) * scale / dim_t[0]), abs=1e-5)
        assert pe[2, 3, 2 * npf - 1] == pytest.approx(
            np.cos((4 / (w + 1e-6)) * scale / dim_t[npf - 1]), abs=1e-5
        )

    def test_sineembed_for_position_shape(self):
        pos = jnp.array([[[0.3, 0.7]]])
        emb = gen_sineembed_for_position(pos)
        assert emb.shape == (1, 1, 256)
        # first half is y-embedding, second half x
        import math
        dim_t0 = 20 ** (0.0)
        assert float(emb[0, 0, 0]) == pytest.approx(math.sin(0.7 * 2 * math.pi / dim_t0), abs=1e-5)
        assert float(emb[0, 0, 128]) == pytest.approx(math.sin(0.3 * 2 * math.pi / dim_t0), abs=1e-5)


class TestPixelDecoder:
    def test_output_shapes(self):
        dec = MSDeformAttnPixelDecoder(conv_dim=32, mask_dim=8, norm="GN",
                                       transformer_layers=1, train=False)
        feats = {
            "res2": jnp.zeros((2, 32, 32, 64)),
            "res3": jnp.zeros((2, 16, 16, 128)),
            "res4": jnp.zeros((2, 8, 8, 256)),
            "res5": jnp.zeros((2, 4, 4, 512)),
        }
        vars_ = jax.jit(dec.init)(jax.random.key(0), feats)
        mask_features, enc_top, ms = jax.jit(dec.apply)(vars_, feats)
        assert mask_features.shape == (2, 32, 32, 32)     # stride 4
        assert enc_top.shape == (2, 4, 4, 32)             # res5'
        assert [m.shape[1] for m in ms] == [4, 8, 16]     # res5', res4', res3'

    def test_level_embed_rides_positional_stream_only(self):
        """Reference msdeformattn.py:74-76: level_embed joins the positional
        embedding (lvl_pos_embed = pos + level_embed), never the src/value
        stream.  With the offset and attention-weight projections zeroed,
        the encoder output depends only on the value stream — so changing
        level_embed must not change the output at all."""
        dec = MSDeformAttnPixelDecoder(conv_dim=32, mask_dim=8, norm="GN",
                                       transformer_layers=1, train=False)
        rs = np.random.RandomState(0)
        feats = {n: jnp.asarray(rs.randn(1, s, s, c), jnp.float32)
                 for n, s, c in (("res2", 32, 64), ("res3", 16, 128),
                                 ("res4", 8, 256), ("res5", 4, 512))}
        vars_ = jax.jit(dec.init)(jax.random.key(0), feats)

        def zero_query_projections(params):
            p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
            layer = p["encoder_layer0"]["self_attn"]
            for k in ("sampling_offsets", "attention_weights"):
                layer[k] = {n: jnp.zeros_like(v) for n, v in layer[k].items()}
            return p

        params = zero_query_projections(vars_["params"])
        out_a = jax.jit(dec.apply)({"params": params}, feats)
        params_b = dict(params)
        params_b["level_embed"] = params["level_embed"] + 37.0
        out_b = jax.jit(dec.apply)({"params": params_b}, feats)
        for a, b in zip(jax.tree_util.tree_leaves(out_a),
                        jax.tree_util.tree_leaves(out_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


class TestFullModel:
    def test_forward_shapes(self):
        model = PCTransModel(config=TINY, train=False)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = jax.jit(model.init)(jax.random.key(0), x)
        out = jax.jit(model.apply)(vars_, x)
        Q = TINY.num_queries
        assert out["pred_masks"].shape == (1, Q, 16, 16)          # stride 4
        assert len(out["aux_masks"]) == TINY.dec_layers
        assert out["reference_points"].shape == (1, Q, 2)
        assert len(out["aux_reference_points"]) == TINY.dec_layers - 1
        assert out["query_emb"].shape == (1, Q, TINY.hidden_dim)
        assert out["sem_mask"].shape == (1, 16, 16, 1)
        assert out["mask_features"].shape == (1, 16, 16, TINY.conv_dim)
        # reference points are valid probabilities
        rp = np.asarray(out["reference_points"])
        assert (rp >= 0).all() and (rp <= 1).all()

    def test_forward_finite_with_random_input(self):
        model = PCTransModel(config=TINY, train=False)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        vars_ = jax.jit(model.init)(jax.random.key(0), x)
        out = jax.jit(model.apply)(vars_, x)
        assert np.isfinite(np.asarray(out["pred_masks"])).all()
        assert np.isfinite(np.asarray(out["query_emb"])).all()

    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_bf16_forward_finite_f32_outputs(self):
        """Mixed precision: bf16 compute, f32 loss-facing outputs, and params
        initialized f32 with the same tree as the f32 model."""
        import dataclasses

        cfg16 = dataclasses.replace(TINY, dtype="bfloat16")
        model = PCTransModel(config=cfg16, train=False)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        vars_ = jax.jit(model.init)(jax.random.key(0), x)
        # params remain f32 (master weights)
        for leaf in jax.tree_util.tree_leaves(vars_["params"]):
            assert leaf.dtype == jnp.float32
        out = jax.jit(model.apply)(vars_, x)
        assert out["pred_masks"].dtype == jnp.float32
        assert out["query_emb"].dtype == jnp.float32
        assert out["mask_features"].dtype == jnp.float32
        assert np.isfinite(np.asarray(out["pred_masks"])).all()
        # same parameter structure as the f32 model (checkpoints interchange)
        vars32 = jax.jit(PCTransModel(config=TINY, train=False).init)(jax.random.key(0), x)
        s16 = jax.tree_util.tree_structure(vars_["params"])
        s32 = jax.tree_util.tree_structure(vars32["params"])
        assert s16 == s32

    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_bf16_close_to_f32(self):
        """bf16 compute should track the f32 forward to bf16-level tolerance."""
        import dataclasses

        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        vars_ = jax.jit(PCTransModel(config=TINY, train=False).init)(jax.random.key(0), x)
        out32 = jax.jit(PCTransModel(config=TINY, train=False).apply)(vars_, x)
        cfg16 = dataclasses.replace(TINY, dtype="bfloat16")
        out16 = jax.jit(PCTransModel(config=cfg16, train=False).apply)(vars_, x)
        m32 = np.asarray(out32["pred_masks"]).ravel()
        m16 = np.asarray(out16["pred_masks"]).ravel()
        # Pointwise worst-case bounds are not meaningful: the decoder's
        # attn-mask threshold (sigmoid < 0.5) is a discrete branch that can
        # flip under dtype noise at random init.  Require strong global
        # agreement instead.  (Bar calibrated at random init: ~0.95 since the
        # level_embed moved off the value stream — the old placement rode a
        # large per-level constant through the values, inflating the
        # correlation with common-mode signal; trained models track far
        # tighter.)
        assert np.corrcoef(m32, m16)[0, 1] > 0.9
        sm32 = np.asarray(out32["sem_mask"]).ravel()
        sm16 = np.asarray(out16["sem_mask"]).ravel()
        assert np.corrcoef(sm32, sm16)[0, 1] > 0.99

    def test_batchnorm_collection_updates(self):
        cfg = ModelConfig(
            hidden_dim=32, conv_dim=32, mask_dim=8, num_queries=10, nheads=4,
            dim_feedforward=64, enc_layers=1, dec_layers=3, head_norm="SyncBN",
        )
        model = PCTransModel(config=cfg, train=True)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        vars_ = jax.jit(model.init)(jax.random.key(0), x)
        assert "batch_stats" in vars_
        out, updates = jax.jit(lambda v, x: model.apply(v, x, mutable=["batch_stats"]))(vars_, x)
        assert "batch_stats" in updates


class TestComponentRegistry:
    def test_standard_transformer_decoder_dispatch(self):
        """MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME selects the DETR
        predictor (reference TRANSFORMER_DECODER_REGISTRY,
        maskformer_transformer_decoder.py:16-27) — previously the key was
        accepted but silently ignored."""
        import dataclasses

        cfg = dataclasses.replace(
            TINY, transformer_decoder_name="StandardTransformerDecoder")
        model = PCTransModel(config=cfg, train=False)
        x = jnp.zeros((1, 32, 32, 3))
        out = jax.jit(model.init)(jax.random.key(0), x)
        res = jax.jit(model.apply)(out, x)
        assert res["pred_masks"].shape[:2] == (1, TINY.num_queries)
        assert "mask_features" in res

    def test_unknown_head_or_decoder_raises(self):
        import dataclasses

        # eval_shape: the errors raise during trace, no compiles needed
        bad_head = dataclasses.replace(TINY, sem_seg_head_name="PerPixelBaselineHead")
        with pytest.raises(ValueError, match="MaskFormerHead"):
            jax.eval_shape(PCTransModel(config=bad_head, train=False).init,
                           jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        bad_dec = dataclasses.replace(TINY, transformer_decoder_name="nope")
        with pytest.raises(ValueError, match="transformer decoder"):
            jax.eval_shape(PCTransModel(config=bad_dec, train=False).init,
                           jax.random.key(0), jnp.zeros((1, 32, 32, 3)))

    def test_remat_policy_selection(self):
        """REMAT_POLICY plumbs config -> ModelConfig; dots-saveable remat
        gradients match full-remat gradients bit-for-bit on a decoder FFN
        layer (a remat policy must never change the math, only what is
        stored vs recomputed)."""
        from flax import linen as nn

        from pctrans_tpu.config import get_cfg_defaults
        from pctrans_tpu.models.layers import remat_policy
        from pctrans_tpu.models.pctrans import build_model_config
        from pctrans_tpu.models.transformer_decoder import FFNLayer

        assert remat_policy("full") is None
        assert remat_policy("dots") is jax.checkpoint_policies.dots_saveable
        with pytest.raises(ValueError, match="REMAT_POLICY"):
            remat_policy("everything")

        cfg = get_cfg_defaults()
        cfg.MODEL.MASK_FORMER.TPU_RECIPE.REMAT_POLICY = "dots"
        assert build_model_config(cfg).remat_policy == "dots"

        x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 32), jnp.float32)
        grads = []
        for pol in ("full", "dots"):
            layer = nn.remat(FFNLayer, policy=remat_policy(pol))(
                d_model=32, dim_feedforward=64)
            v = layer.init(jax.random.key(0), x)

            def loss(p, layer=layer):
                return layer.apply({"params": p}, x).sum()

            grads.append(jax.jit(jax.grad(loss))(v["params"]))
        for ga, gb in zip(*(jax.tree_util.tree_leaves(g) for g in grads)):
            np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
