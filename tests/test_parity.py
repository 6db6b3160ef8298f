"""Network-level parity: flax modules vs torch transcriptions of the
reference decoder math, sharing the SAME weights.

Each test extracts the flax module's initialized parameters, loads them into
a literal torch transcription of the corresponding reference component, and
asserts the outputs match:

* decoupled cross-attention at 2*d_model with the custom vdim MHA
  (mask2former_transformer_decoder.py CrossAttentionLayer:105-193 +
  attention.py multi_head_attention_forward:181+, scaling (2d/h)^-0.5,
  out_proj on vdim)
* decoupled self-attention (:47-103)
* the CondInst dynamic mask head: controller params -> parse_dynamic_params
  -> grouped 1x1 convs over [rel_coords, mask_feats] -> bilinear attn mask
  and 2x upsample (:647-719, 929-979)
* the full decoder forward pass against a step-by-step torch replay of one
  layer's update chain (sine embed, query_scale gating, point refinement).

This is the composite-parity evidence the per-op oracles (test_ops.py,
test_losses.py) don't cover.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from jit_helpers import jit_apply, jit_init

from pctrans_tpu.models.transformer_decoder import (
    CrossAttentionLayer,
    MultiScaleMaskedTransformerDecoder,
    SelfAttentionLayer,
    compute_locations,
)

D, H_HEADS, Q, S = 16, 2, 5, 12
RS = np.random.RandomState(0)


def lin(p):
    """flax Dense params -> torch linear apply fn."""
    w = torch.from_numpy(np.asarray(p["kernel"])).T.float()
    b = torch.from_numpy(np.asarray(p["bias"])).float()
    return lambda x: F.linear(x, w, b)


def layernorm(p, x):
    w = torch.from_numpy(np.asarray(p["scale"])).float()
    b = torch.from_numpy(np.asarray(p["bias"])).float()
    return F.layer_norm(x, (x.shape[-1],), w, b)


def mha_2d_vdim(q, k, v, nheads, out_proj, attn_mask=None):
    """Custom MultiheadAttention (attention.py:181+): embed 2d for q/k,
    values at vdim, scaling (2d/h)^-0.5, out_proj Linear(vdim, vdim).
    q: [B, Q, 2d], k: [B, S, 2d], v: [B, S, d]."""
    B, Lq, E = q.shape
    Lk = k.shape[1]
    Ev = v.shape[-1]
    head_dim = E // nheads
    v_head = Ev // nheads
    q = (q * head_dim ** -0.5).reshape(B, Lq, nheads, head_dim).transpose(1, 2)
    k = k.reshape(B, Lk, nheads, head_dim).transpose(1, 2)
    v = v.reshape(B, Lk, nheads, v_head).transpose(1, 2)
    logits = q @ k.transpose(-2, -1)
    if attn_mask is not None:
        logits = logits + attn_mask[:, None]
    attn = torch.softmax(logits, -1)
    out = (attn @ v).transpose(1, 2).reshape(B, Lq, Ev)
    return out_proj(out)


class TestCrossAttentionParity:
    @pytest.mark.parametrize("is_first", [True, False])
    def test_matches_torch_transcription(self, is_first):
        layer = CrossAttentionLayer(D, H_HEADS)
        tgt = RS.randn(2, Q, D).astype(np.float32)
        memory = RS.randn(2, S, D).astype(np.float32)
        pos = RS.randn(2, S, D).astype(np.float32)
        query_pos = RS.randn(2, Q, D).astype(np.float32)
        sine = RS.randn(2, Q, 2 * D).astype(np.float32)
        bias = np.where(RS.rand(2, Q, S) < 0.3, -1e9, 0.0).astype(np.float32)
        # avoid fully-masked rows (the flax model resets them upstream)
        bias[:, :, 0] = 0.0

        variables = jit_init(layer, *map(jnp.asarray,
                             (tgt, memory, pos, query_pos, sine, bias)),
                             static=(is_first,))
        ours = np.asarray(jit_apply(layer, variables, *map(jnp.asarray,
                          (tgt, memory, pos, query_pos, sine, bias)),
                          static=(is_first,)))

        p = variables["params"]
        t_tgt, t_mem, t_pos, t_qpos, t_sine = map(
            torch.from_numpy, (tgt, memory, pos, query_pos, sine))
        q_content = lin(p["ca_qcontent_proj"])(t_tgt)
        k_content = lin(p["ca_kcontent_proj"])(t_mem)
        v = lin(p["ca_v_proj"])(t_mem)
        k_pos = lin(p["ca_kpos_proj"])(t_pos)
        if is_first:  # :150-158
            q = q_content + lin(p["ca_qpos_proj"])(t_qpos)
            k = k_content + k_pos
        else:
            q, k = q_content, k_content
        sine_p = lin(p["ca_qpos_sine_proj"])(t_sine)
        hd = D // H_HEADS
        q = torch.cat([q.view(2, Q, H_HEADS, hd),
                       sine_p.view(2, Q, H_HEADS, hd)], 3).view(2, Q, 2 * D)
        k = torch.cat([k.view(2, S, H_HEADS, hd),
                       k_pos.view(2, S, H_HEADS, hd)], 3).view(2, S, 2 * D)
        attn_out = mha_2d_vdim(q, k, v, H_HEADS, lin(p["out_proj"]),
                               torch.from_numpy(bias))
        ref = layernorm(p["norm2"], t_tgt + attn_out).numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


class TestSelfAttentionParity:
    def test_matches_torch_transcription(self):
        layer = SelfAttentionLayer(D, H_HEADS)
        tgt = RS.randn(2, Q, D).astype(np.float32)
        query_pos = RS.randn(2, Q, D).astype(np.float32)
        variables = jit_init(layer, jnp.asarray(tgt), jnp.asarray(query_pos),
                             seed=1)
        ours = np.asarray(jit_apply(layer, variables, jnp.asarray(tgt),
                                    jnp.asarray(query_pos)))
        p = variables["params"]
        t_tgt, t_qpos = torch.from_numpy(tgt), torch.from_numpy(query_pos)
        q = lin(p["sa_qcontent_proj"])(t_tgt) + lin(p["sa_qpos_proj"])(t_qpos)
        k = lin(p["sa_kcontent_proj"])(t_tgt) + lin(p["sa_kpos_proj"])(t_qpos)
        v = lin(p["sa_v_proj"])(t_tgt)
        attn_out = mha_2d_vdim(q, k, v, H_HEADS, lin(p["out_proj"]))
        ref = layernorm(p["norm1"], t_tgt + attn_out).numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


class TestDynamicMaskParity:
    def test_matches_grouped_conv_transcription(self):
        """Render masks with the reference's grouped-conv formulation
        (parse_dynamic_params:944-979, mask_heads_forward:699-719,
        dynamic_mask_with_coords:647-697) from the same controller params."""
        B, Q2, Hm, Wm, Cm, ch, stride = 2, 3, 8, 8, 4, 8, 4
        dec = MultiScaleMaskedTransformerDecoder(
            hidden_dim=D, num_queries=Q2, nheads=H_HEADS, dim_feedforward=32,
            dec_layers=2, mask_dim=Cm, upsample2x=True, train=False)
        cin = Cm + 2
        weight_nums = [cin * ch, ch * ch, ch]
        bias_nums = [ch, ch, 1]
        n_params = sum(weight_nums) + sum(bias_nums)

        mask_feat = RS.randn(B, Hm, Wm, Cm).astype(np.float32)
        refs = RS.rand(B, Q2, 2).astype(np.float32)
        params = RS.randn(B, Q2, n_params).astype(np.float32)

        ms = [jnp.zeros((B, 4, 4, D)), jnp.zeros((B, 8, 8, D)),
              jnp.zeros((B, 16, 16, D))]
        variables = jit_init(dec, ms, jnp.zeros((B, Hm, Wm, D)), seed=2)
        logits, attn_bias = jit_apply(
            dec, variables, jnp.asarray(mask_feat), jnp.asarray(refs),
            jnp.asarray(params), static=((4, 4),),
            method=MultiScaleMaskedTransformerDecoder.dynamic_mask_with_coords)
        logits = np.asarray(logits)

        # ---- torch transcription ----
        t_feat = torch.from_numpy(mask_feat).permute(0, 3, 1, 2)  # NCHW
        scale = torch.tensor([Wm * stride, Hm * stride]).float()
        inst_xy = torch.from_numpy(refs) * scale
        locs = np.asarray(compute_locations(Hm, Wm, stride))
        rel = (inst_xy.reshape(B, Q2, 1, 2)
               - torch.from_numpy(locs).reshape(1, 1, Hm * Wm, 2))
        rel = rel.permute(0, 1, 3, 2)                              # [B,Q,2,HW]
        inputs = torch.cat(
            [rel, t_feat.reshape(B, 1, Cm, Hm * Wm).expand(B, Q2, Cm, -1)], 2)
        inputs = inputs.reshape(1, -1, Hm, Wm)                     # grouped form
        flat = torch.from_numpy(params).flatten(0, 1)              # [B*Q, P]
        splits = list(torch.split_with_sizes(flat, weight_nums + bias_nums, 1))
        n_inst = B * Q2
        w1 = splits[0].reshape(n_inst * ch, cin, 1, 1)
        w2 = splits[1].reshape(n_inst * ch, ch, 1, 1)
        w3 = splits[2].reshape(n_inst * 1, ch, 1, 1)
        b1 = splits[3].reshape(-1)
        b2 = splits[4].reshape(-1)
        b3 = splits[5].reshape(-1)
        x = F.relu(F.conv2d(inputs, w1, b1, groups=n_inst))
        x = F.relu(F.conv2d(x, w2, b2, groups=n_inst))
        x = F.conv2d(x, w3, b3, groups=n_inst).reshape(B, Q2, Hm, Wm)
        ref_logits = F.interpolate(x, size=(Hm * 2, Wm * 2), mode="bilinear",
                                   align_corners=False)
        np.testing.assert_allclose(logits, ref_logits.numpy(),
                                   rtol=1e-4, atol=1e-4)

        # attn mask: sigmoid < 0.5 at the interpolated target size (:689-691)
        attn_ref = F.interpolate(x, size=(4, 4), mode="bilinear",
                                 align_corners=False)
        masked_ref = (attn_ref.sigmoid().flatten(2) < 0.5).numpy()
        all_masked = masked_ref.all(-1, keepdims=True)
        masked_ref = np.where(all_masked, False, masked_ref)
        np.testing.assert_array_equal(np.asarray(attn_bias) < -1e8, masked_ref)


class TestDecoderChainParity:
    def test_reference_point_update_chain(self):
        """One decoder iteration's point-refinement math replayed in torch:
        sigmoid(point_embed(output) + inverse_sigmoid(ref)) with clamped
        logits (reference inverse_sigmoid:41, :583-593)."""
        from pctrans_tpu.models.layers import MLP, inverse_sigmoid

        mlp = MLP(D, 2, 3)
        x = RS.randn(2, Q, D).astype(np.float32)
        ref = RS.rand(2, Q, 2).astype(np.float32)
        variables = jit_init(mlp, jnp.asarray(x), seed=3)
        new_ref = np.asarray(jax.nn.sigmoid(
            jit_apply(mlp, variables, jnp.asarray(x))
            + inverse_sigmoid(jnp.asarray(ref))))

        p = variables["params"]
        t = torch.from_numpy(x)
        for i in range(3):
            t = lin(p[f"Dense_{i}"])(t)
            if i < 2:
                t = F.relu(t)
        r = torch.from_numpy(ref).clamp(0, 1)
        inv = torch.log(r.clamp(min=1e-3) / (1 - r).clamp(min=1e-3))
        ref_out = torch.sigmoid(t + inv).numpy()
        np.testing.assert_allclose(new_ref, ref_out, rtol=1e-5, atol=1e-6)


class TestPostprocessParity:
    """Postprocess vs literal torch transcriptions of the reference
    (arch/maskformer.py mask_nms:357-390, dice_for:392-401,
    mask_post:403-431) on identical random masks."""

    def _torch_mask_post(self, inst_masks, thres1, thres2, bd_flag):
        m = torch.from_numpy(inst_masks)
        flat = m.flatten(1)
        numer = flat @ flat.T
        s = flat.sum(-1)
        dice = (2 * numer + 1) / (s[:, None] + s[None, :] + 1)
        qn = dice.shape[0]
        clustered, groups = [], []
        for i in range(qn):
            if i in clustered:
                continue
            cluster = torch.where(dice[i] > thres1)[0].tolist()
            clustered += cluster
            groups.append(cluster)
        outs = []
        for ids in groups:
            merged = m[ids].float().mean(0)
            if bd_flag:
                merged = (merged > thres2).float()
            outs.append(merged)
        return torch.stack(outs).numpy()

    def _torch_mask_nms(self, masks, scores, thres):
        m = torch.from_numpy(masks)
        order = torch.argsort(torch.from_numpy(scores)).tolist()[::-1]
        n = m.shape[0]
        suppressed = np.zeros(n, int)
        keep = []
        for i in range(n):
            idx = order[i]
            if suppressed[idx]:
                continue
            keep.append(idx)
            a = m[idx]
            area_a = a.sum()
            for j in range(i, n):
                jdx = order[j]
                if suppressed[jdx]:
                    continue
                b = m[jdx]
                area_b = b.sum()
                inter = (a * b).sum()
                eps = 1e-5
                aa = area_a + (eps if (area_a == 0 or area_b == 0) else 0)
                bb = area_b + (eps if (area_a == 0 or area_b == 0) else 0)
                if max(inter / aa, inter / bb) >= thres:
                    suppressed[jdx] = 1
        return m[keep].numpy()

    def _random_masks(self, n=8, hw=24, seed=0):
        rs = np.random.RandomState(seed)
        masks = np.zeros((n, hw, hw), np.float32)
        for i in range(n):
            y, x = rs.randint(0, hw - 8, 2)
            h, w = rs.randint(4, 9, 2)
            masks[i, y : y + h, x : x + w] = 1.0
        return masks

    @pytest.mark.parametrize("bd_flag", [False, True])
    def test_mask_post(self, bd_flag):
        from pctrans_tpu.inference.postprocess import mask_post

        masks = self._random_masks(seed=3)
        ours = mask_post(masks, thres1=0.5, thres2=0.6, bd_flag=bd_flag)
        ref = self._torch_mask_post(masks, 0.5, 0.6, bd_flag)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    def test_mask_nms(self):
        from pctrans_tpu.inference.postprocess import mask_nms

        masks = self._random_masks(seed=5)
        # area-ratio scores like the reference eval path (:296-300); strictly
        # unique so np/torch argsort tie-breaking cannot diverge (the greedy
        # NMS is order-dependent by design)
        scores = (masks.sum((1, 2)) / masks[0].size
                  + np.arange(masks.shape[0]) * 1e-6)
        ours = mask_nms(masks, scores, thres=0.72)
        ref = self._torch_mask_nms(masks, scores, 0.72)
        np.testing.assert_allclose(ours, ref)


class TestDeformableEncoderLayerParity:
    def test_matches_torch_transcription(self):
        """Full deformable encoder layer (msdeformattn.py:92-133 + the
        MSDeformAttn module ops/modules/ms_deform_attn.py:82-125) replayed
        in torch with shared weights: value/offset/weight projections,
        softmax over (levels x points), per-level (W, H) offset
        normalization, grid_sample blending, output projection, residual +
        LayerNorm, FFN, LayerNorm.  This is the encoder-side counterpart of
        the decoder-layer parity tests (the component with no coverage when
        the level-embed placement bug slipped in)."""
        from test_ops import msda_torch_oracle

        from pctrans_tpu.models.pixel_decoder import (
            MSDeformAttnEncoderLayer,
            encoder_reference_points,
        )

        d_model, heads, points = 16, 2, 2
        shapes = ((6, 8), (3, 4), (2, 2))
        S = sum(h * w for h, w in shapes)
        rs = np.random.RandomState(7)
        src = rs.randn(2, S, d_model).astype(np.float32)
        pos = rs.randn(2, S, d_model).astype(np.float32)
        refs = np.asarray(encoder_reference_points(shapes))
        refs = np.broadcast_to(refs[None], (2,) + refs.shape)

        layer = MSDeformAttnEncoderLayer(
            d_model=d_model, d_ffn=32, n_levels=3, n_heads=heads,
            n_points=points, train=False)
        vars_ = jit_init(layer, jnp.asarray(src), jnp.asarray(pos),
                         jnp.asarray(refs), seed=5, static=(shapes,))
        out = np.asarray(jit_apply(
            layer, vars_, jnp.asarray(src), jnp.asarray(pos),
            jnp.asarray(refs), static=(shapes,)))

        # ---- torch transcription ----
        p = vars_["params"]
        pa = p["self_attn"]
        t_src = torch.from_numpy(src)
        query = t_src + torch.from_numpy(pos)

        value = lin(pa["value_proj"])(t_src).view(2, S, heads, d_model // heads)
        offsets = lin(pa["sampling_offsets"])(query).view(
            2, S, heads, 3, points, 2)
        attn = lin(pa["attention_weights"])(query).view(
            2, S, heads, 3 * points)
        attn = torch.softmax(attn, -1).view(2, S, heads, 3, points)
        normalizer = torch.tensor([[w, h] for (h, w) in shapes]).float()
        locs = (torch.from_numpy(refs)[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :])
        blended = msda_torch_oracle(value.numpy(), shapes, locs.numpy(),
                                    attn.numpy())
        attn_out = lin(pa["output_proj"])(torch.from_numpy(blended))
        x = layernorm(p["norm1"], t_src + attn_out)
        y = lin(p["linear2"])(torch.relu(lin(p["linear1"])(x)))
        ref_out = layernorm(p["norm2"], x + y).numpy()

        np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-4)


class TestPixelDecoderParity:
    def test_full_forward_matches_torch_transcription(self):
        """The ENTIRE MSDeformAttnPixelDecoder forward replayed in torch
        with shared weights (msdeformattn.py:314-360): input 1x1
        projections + GroupNorm, sine positional embeddings with
        level_embed on the POSITIONAL stream, the deformable encoder
        layer, the per-level split, and the res2 FPN fusion (lateral 1x1
        conv + GN, bilinear-upsample add, 3x3 output conv + GN + relu).
        Wiring-level coverage — the class of bug (level-embed placement)
        component tests miss."""
        from test_ops import msda_torch_oracle

        from pctrans_tpu.models.layers import position_embedding_sine
        from pctrans_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder

        conv_dim = 32
        dec = MSDeformAttnPixelDecoder(conv_dim=conv_dim, mask_dim=8,
                                       norm="GN", transformer_layers=1,
                                       n_heads=2, n_points=2, train=False)
        rs = np.random.RandomState(3)
        feats = {n: rs.randn(1, s, s, c).astype(np.float32)
                 for n, s, c in (("res2", 16, 32), ("res3", 8, 64),
                                 ("res4", 4, 128), ("res5", 2, 256))}
        jfeats = {k: jnp.asarray(v) for k, v in feats.items()}
        vars_ = jax.jit(dec.init)(jax.random.key(11), jfeats)
        mask_features, enc_top, ms = jax.jit(dec.apply)(vars_, jfeats)
        p = vars_["params"]

        def conv1x1(pp, x):   # NHWC, flax kernel [1,1,Cin,Cout]
            w = torch.from_numpy(np.asarray(pp["kernel"]))[0, 0].float()
            y = torch.einsum("bhwc,co->bhwo", x, w)
            if "bias" in pp:
                y = y + torch.from_numpy(np.asarray(pp["bias"])).float()
            return y

        def conv3x3(pp, x):   # SAME padding
            w = torch.from_numpy(np.asarray(pp["kernel"])).permute(3, 2, 0, 1).float()
            xt = x.permute(0, 3, 1, 2)
            y = F.conv2d(xt, w, padding=1)
            return y.permute(0, 2, 3, 1)

        def gn(pp, x):        # over the channel axis, torch eps
            xt = x.permute(0, 3, 1, 2)
            w = torch.from_numpy(np.asarray(pp["scale"])).float()
            b = torch.from_numpy(np.asarray(pp["bias"])).float()
            return F.group_norm(xt, 32, w, b, eps=1e-5).permute(0, 2, 3, 1)

        # ---- torch transcription ----
        tif = ["res5", "res4", "res3"]   # top-down order
        srcs, poss, shapes = [], [], []
        for idx, name in enumerate(tif):
            x = torch.from_numpy(feats[name])
            y = conv1x1(p[f"input_proj{idx}_conv"]
                        if f"input_proj{idx}_conv" in p else
                        p[f"input_proj{idx}"], x)
            y = gn(p[f"input_gn{idx}"], y)
            B, H, W, _ = y.shape
            srcs.append(y.reshape(B, H * W, conv_dim))
            pe = np.asarray(position_embedding_sine(H, W, conv_dim // 2))
            poss.append(torch.from_numpy(pe.reshape(1, H * W, conv_dim))
                        .expand(B, -1, -1).float())
            shapes.append((H, W))
        src = torch.cat(srcs, 1)
        lvl = torch.from_numpy(np.asarray(p["level_embed"])).float()
        pos = torch.cat([pp + lvl[i] for i, pp in enumerate(poss)], 1)

        # encoder layer (shared transcription with the layer-level test)
        from pctrans_tpu.models.pixel_decoder import encoder_reference_points

        refs = np.asarray(encoder_reference_points(tuple(shapes)))
        refs = np.broadcast_to(refs[None], (1,) + refs.shape)
        pl = p["encoder_layer0"]
        pa = pl["self_attn"]
        S = src.shape[1]
        heads, points = 2, 2
        query = src + pos
        value = lin(pa["value_proj"])(src).view(1, S, heads, conv_dim // heads)
        offsets = lin(pa["sampling_offsets"])(query).view(1, S, heads, 3, points, 2)
        attnw = torch.softmax(
            lin(pa["attention_weights"])(query).view(1, S, heads, 3 * points),
            -1).view(1, S, heads, 3, points)
        normalizer = torch.tensor([[w, h] for (h, w) in shapes]).float()
        locs = (torch.from_numpy(refs.copy())[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :])
        blended = msda_torch_oracle(value.detach().numpy(), shapes,
                                    locs.detach().numpy(),
                                    attnw.detach().numpy())
        attn_out = lin(pa["output_proj"])(torch.from_numpy(blended))
        x = layernorm(pl["norm1"], src + attn_out)
        y = lin(pl["linear2"])(torch.relu(lin(pl["linear1"])(x)))
        enc = layernorm(pl["norm2"], x + y)

        # split back + FPN fusion for res2
        outs, start = [], 0
        for (H, W) in shapes:
            outs.append(enc[:, start:start + H * W].reshape(1, H, W, conv_dim))
            start += H * W
        r2 = torch.from_numpy(feats["res2"])
        lateral = gn(p["adapter0"]["GroupNorm_0"], conv1x1(p["adapter0"]["Conv_0"], r2))
        up = F.interpolate(outs[-1].permute(0, 3, 1, 2), size=r2.shape[1:3],
                           mode="bilinear", align_corners=False)
        fused = lateral + up.permute(0, 2, 3, 1)
        fused = gn(p["layer0"]["GroupNorm_0"], conv3x3(p["layer0"]["Conv_0"], fused))
        fused = torch.relu(fused)

        np.testing.assert_allclose(np.asarray(enc_top), outs[0].numpy(),
                                   rtol=2e-4, atol=2e-4)
        for a, b in zip(ms, outs):
            np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                       rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(mask_features), fused.numpy(),
                                   rtol=2e-4, atol=2e-4)
