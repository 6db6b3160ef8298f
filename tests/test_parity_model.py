"""WHOLE-decoder parity: the full flax MultiScaleMaskedTransformerDecoder
forward vs a complete step-by-step torch replay of the reference
(mask2former_transformer_decoder.py:502-645) with shared weights.

Component parity (tests/test_parity.py) proves each block; this file proves
the COMPOSITION: layer wiring, round-robin level selection, attention-mask
threading, reference-point list indexing (ref_points[i] in the per-layer
coord head, :606-612), aux output ordering, and the sem head — the places
where integration bugs hide.

Every learned parameter comes from the flax init; the torch side re-applies
them through literal transcriptions of the reference ops (torch linear /
grouped conv / F.interpolate / F.batch_norm).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pctrans_tpu.models.transformer_decoder import (
    MultiScaleMaskedTransformerDecoder,
    compute_locations,
)
from test_parity import lin, layernorm, mha_2d_vdim
from jit_helpers import jit_apply, jit_init

# tiny but fully-featured config: 4 layers wraps the 3-level round-robin
D, HEADS, NQ, LAYERS, FFN, CM, CH = 32, 4, 8, 4, 64, 8, 8
B = 2
SIZES = [(4, 3), (8, 6), (16, 12)]           # x[0] coarsest, like the model
HM, WM = 16, 12                              # mask features (stride 4)
RS = np.random.RandomState(7)


def torch_mlp(p, x, n_layers):
    for i in range(n_layers):
        x = lin(p[f"Dense_{i}"])(x)
        if i < n_layers - 1:
            x = F.relu(x)
    return x


def torch_pos_sine2d(h, w, num_pos_feats):
    """PositionEmbeddingSine (position_encoding.py:29-52), normalize=True."""
    scale = 2 * math.pi
    y = torch.arange(1, h + 1).float()[:, None].expand(h, w).clone()
    x = torch.arange(1, w + 1).float()[None, :].expand(h, w).clone()
    y = y / (h + 1e-6) * scale
    x = x / (w + 1e-6) * scale
    dim_t = torch.arange(num_pos_feats).float()
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = torch.stack([px[:, :, 0::2].sin(), px[:, :, 1::2].cos()],
                     dim=3).flatten(2)
    py = torch.stack([py[:, :, 0::2].sin(), py[:, :, 1::2].cos()],
                     dim=3).flatten(2)
    return torch.cat([py, px], dim=2).reshape(h * w, 2 * num_pos_feats)


def torch_sineembed(pos, dim, temperature=20.0):
    """gen_sineembed_for_position (:21-39), per (x, y) -> [.., 2*dim]."""
    scale = 2 * math.pi
    dim_t = torch.arange(dim).float()
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / dim)
    x_embed = pos[..., 0] * scale
    y_embed = pos[..., 1] * scale
    px = x_embed[..., None] / dim_t
    py = y_embed[..., None] / dim_t
    px = torch.stack([px[..., 0::2].sin(), px[..., 1::2].cos()],
                     dim=-1).flatten(-2)
    py = torch.stack([py[..., 0::2].sin(), py[..., 1::2].cos()],
                     dim=-1).flatten(-2)
    return torch.cat([py, px], dim=-1)


def torch_inverse_sigmoid(x, eps=1e-3):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def torch_dynamic_mask(p_controller_out, mask_feat, refs, attn_size,
                       stride=4, upsample=True):
    """dynamic_mask_with_coords via grouped 1x1 convs (:647-719, 944-979).

    mask_feat: torch [B, Cm, Hm, Wm]; refs: torch [B, Q, 2];
    p_controller_out: torch [B, Q, n_params].  Returns (logits [B, Q, 2Hm,
    2Wm], attn_bias_bool [B, Q, h*w] True = masked, after the row reset)."""
    Bq, Q = refs.shape[:2]
    Hm, Wm = mask_feat.shape[-2:]
    cin = CM + 2
    weight_nums = [cin * CH, CH * CH, CH]
    bias_nums = [CH, CH, 1]
    scale = torch.tensor([Wm * stride, Hm * stride]).float()
    inst_xy = refs * scale
    locs = torch.from_numpy(np.asarray(compute_locations(Hm, Wm, stride)))
    rel = (inst_xy.reshape(Bq, Q, 1, 2) - locs.reshape(1, 1, Hm * Wm, 2))
    rel = rel.permute(0, 1, 3, 2)
    inputs = torch.cat(
        [rel, mask_feat.reshape(Bq, 1, CM, Hm * Wm).expand(Bq, Q, CM, -1)], 2)
    inputs = inputs.reshape(1, -1, Hm, Wm)
    flat = p_controller_out.flatten(0, 1)
    splits = list(torch.split_with_sizes(flat, weight_nums + bias_nums, 1))
    n_inst = Bq * Q
    w1 = splits[0].reshape(n_inst * CH, cin, 1, 1)
    w2 = splits[1].reshape(n_inst * CH, CH, 1, 1)
    w3 = splits[2].reshape(n_inst, CH, 1, 1)
    x = F.relu(F.conv2d(inputs, w1, splits[3].reshape(-1), groups=n_inst))
    x = F.relu(F.conv2d(x, w2, splits[4].reshape(-1), groups=n_inst))
    x = F.conv2d(x, w3, splits[5].reshape(-1), groups=n_inst)
    x = x.reshape(Bq, Q, Hm, Wm)
    attn = F.interpolate(x, size=attn_size, mode="bilinear",
                         align_corners=False)
    masked = attn.sigmoid().flatten(2) < 0.5
    all_masked = masked.all(-1, keepdim=True)
    masked = torch.where(all_masked, torch.zeros_like(masked), masked)
    logits = F.interpolate(x, size=(Hm * 2, Wm * 2), mode="bilinear",
                           align_corners=False) if upsample else x
    return logits, masked


def torch_convnorm(p, stats, x):
    """ConvNorm(3x3, SyncBN, relu, no bias) in eval mode."""
    w = torch.from_numpy(np.asarray(p["Conv_0"]["kernel"])).permute(
        3, 2, 0, 1).float()
    x = F.conv2d(x, w, None, padding=1)
    bn = p["BatchNorm_0"]
    x = F.batch_norm(
        x, torch.from_numpy(np.asarray(stats["BatchNorm_0"]["mean"])).float(),
        torch.from_numpy(np.asarray(stats["BatchNorm_0"]["var"])).float(),
        torch.from_numpy(np.asarray(bn["scale"])).float(),
        torch.from_numpy(np.asarray(bn["bias"])).float(),
        training=False, eps=1e-5)
    return F.relu(x)


def torch_decoder_replay(p, stats, feats, mask_features):
    """The reference forward (:502-645), literally, from flax params."""
    src, pos, size_list = [], [], []
    level_embed = torch.from_numpy(np.asarray(p["level_embed"])).float()
    for i, f in enumerate(feats):
        h, w = f.shape[1:3]
        size_list.append((h, w))
        pos.append(torch_pos_sine2d(h, w, D // 2)[None].expand(B, -1, -1))
        src.append(torch.from_numpy(f).reshape(B, h * w, D) + level_embed[i])

    query_embed = torch.from_numpy(np.asarray(p["query_embed"]))[None].expand(
        B, -1, -1).float()
    output = torch.from_numpy(np.asarray(p["query_feat"]))[None].expand(
        B, -1, -1).float()

    reference_points = torch_mlp(p["ref_point_head"], query_embed, 2).sigmoid()
    ref_points = [reference_points]

    mf = torch.from_numpy(mask_features)                       # [B, Hm, Wm, D]
    y = mf.permute(0, 3, 1, 2)
    y = torch_convnorm(p["seg_head0"], stats["seg_head0"], y)
    y = torch_convnorm(p["seg_head1"], stats["seg_head1"], y)
    wl = torch.from_numpy(np.asarray(p["sem_logits"]["kernel"])).permute(
        3, 2, 0, 1).float()
    bl = torch.from_numpy(np.asarray(p["sem_logits"]["bias"])).float()
    sem_mask = F.conv2d(y, wl, bl).permute(0, 2, 3, 1)

    wmh = torch.from_numpy(np.asarray(p["mask_head"]["kernel"])).permute(
        3, 2, 0, 1).float()
    bmh = torch.from_numpy(np.asarray(p["mask_head"]["bias"])).float()
    mask_feat = F.conv2d(mf.permute(0, 3, 1, 2), wmh, bmh)     # [B, Cm, Hm, Wm]

    predictions_mask, outputs_coords = [], []
    params_dyn = torch_mlp(p["controller"], output, 3)
    outputs_mask, masked = torch_dynamic_mask(
        params_dyn, mask_feat, reference_points, size_list[0])
    predictions_mask.append(outputs_mask)

    for i in range(LAYERS):
        obj_center = reference_points
        query_sine_embed = torch_sineembed(obj_center, D)
        if i != 0:
            query_sine_embed = query_sine_embed * torch_mlp(
                p["query_scale"], output, 2)

        level = i % 3
        attn_bias = torch.where(masked, -1e9, 0.0)

        # cross-attention (CrossAttentionLayer :105-193)
        cp = p[f"cross{i}"]
        q_content = lin(cp["ca_qcontent_proj"])(output)
        k_content = lin(cp["ca_kcontent_proj"])(src[level])
        v = lin(cp["ca_v_proj"])(src[level])
        k_pos = lin(cp["ca_kpos_proj"])(pos[level])
        if i == 0:
            q = q_content + lin(cp["ca_qpos_proj"])(query_embed)
            k = k_content + k_pos
        else:
            q, k = q_content, k_content
        sine_p = lin(cp["ca_qpos_sine_proj"])(query_sine_embed)
        hd = D // HEADS
        S = src[level].shape[1]
        q = torch.cat([q.view(B, NQ, HEADS, hd),
                       sine_p.view(B, NQ, HEADS, hd)], 3).view(B, NQ, 2 * D)
        k = torch.cat([k.view(B, S, HEADS, hd),
                       k_pos.view(B, S, HEADS, hd)], 3).view(B, S, 2 * D)
        attn_out = mha_2d_vdim(q, k, v, HEADS, lin(cp["out_proj"]), attn_bias)
        output = layernorm(cp["norm2"], output + attn_out)

        # self-attention (:47-103)
        sp = p[f"self{i}"]
        q = lin(sp["sa_qcontent_proj"])(output) + lin(sp["sa_qpos_proj"])(
            query_embed)
        k = lin(sp["sa_kcontent_proj"])(output) + lin(sp["sa_kpos_proj"])(
            query_embed)
        v = lin(sp["sa_v_proj"])(output)
        attn_out = mha_2d_vdim(q, k, v, HEADS, lin(sp["out_proj"]))
        output = layernorm(sp["norm1"], output + attn_out)

        # FFN
        fp = p[f"ffn{i}"]
        yf = lin(fp["linear2"])(F.relu(lin(fp["linear1"])(output)))
        output = layernorm(fp["norm"], output + yf)

        # iterative refinement with detach (:583-593)
        tmp = torch_mlp(p["point_embed"], output, 3)
        tmp = tmp + torch_inverse_sigmoid(reference_points)
        new_reference_points = tmp.sigmoid()
        if i != LAYERS - 1:
            ref_points.append(new_reference_points)
        reference_points = new_reference_points.detach()

        params_dyn = torch_mlp(p["controller"], output, 3)
        outputs_mask, masked = torch_dynamic_mask(
            params_dyn, mask_feat, new_reference_points,
            size_list[(i + 1) % 3])
        predictions_mask.append(outputs_mask)

        # per-layer coord head on the NORMED output with ref_points[i] (:606)
        decoder_output = layernorm(p["decoder_norm"], output)
        tmp = torch_mlp(p["point_embed"], decoder_output, 3)
        outputs_coords.append(
            (tmp + torch_inverse_sigmoid(ref_points[i])).sigmoid())

    return {
        "predictions_mask": [m.numpy() for m in predictions_mask],
        "outputs_coords": [c.numpy() for c in outputs_coords],
        "query_emb": output.numpy(),
        "sem_mask": sem_mask.numpy(),
    }


class TestWholeDecoderParity:
    def test_full_forward_matches_reference_replay(self):
        dec = MultiScaleMaskedTransformerDecoder(
            hidden_dim=D, num_queries=NQ, nheads=HEADS, dim_feedforward=FFN,
            dec_layers=LAYERS, mask_dim=CM, dynamic_mask_channels=CH,
            upsample2x=True, train=False)

        feats = [RS.randn(B, h, w, D).astype(np.float32) for h, w in SIZES]
        mask_features = RS.randn(B, HM, WM, D).astype(np.float32)

        variables = jit_init(dec, [jnp.asarray(f) for f in feats],
                             jnp.asarray(mask_features))
        # non-trivial weights: init then perturb deterministically so no
        # zero-initialized head hides a wiring bug
        variables = jax.tree.map(
            lambda a: a + jnp.asarray(
                np.random.RandomState(a.size % 9973).randn(*a.shape)
                * 0.05).astype(a.dtype),
            variables)
        out = jit_apply(dec, variables, [jnp.asarray(f) for f in feats],
                        jnp.asarray(mask_features))

        p = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        ref = torch_decoder_replay(p, stats, feats, mask_features)

        ours_masks = [np.asarray(m) for m in out["aux_masks"]] + [
            np.asarray(out["pred_masks"])]
        assert len(ours_masks) == len(ref["predictions_mask"]) == LAYERS + 1
        for l, (a, b) in enumerate(zip(ours_masks, ref["predictions_mask"])):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-4,
                                       err_msg=f"mask logits layer {l}")

        ours_coords = [np.asarray(c) for c in out["aux_reference_points"]] + [
            np.asarray(out["reference_points"])]
        assert len(ours_coords) == len(ref["outputs_coords"]) == LAYERS
        for l, (a, b) in enumerate(zip(ours_coords, ref["outputs_coords"])):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5,
                                       err_msg=f"coords layer {l}")

        np.testing.assert_allclose(np.asarray(out["query_emb"]),
                                   ref["query_emb"], rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out["sem_mask"]),
                                   ref["sem_mask"], rtol=1e-3, atol=2e-4)


class TestCriterionParity:
    """Exact-mode SetCriterion vs torch transcriptions of the reference loss
    math (maskformer_criterion.py:216-285, 385-426, 450-506), on a
    construction where Hungarian matching is forced (query 2j carries +/-8
    logits exactly on instance j) so sampled matcher points cannot change
    the assignment, and with the PointRend coords shared bit-for-bit by
    replaying the criterion's RNG stream through the same public sampler."""

    HF, WF = 32, 24          # full-resolution targets
    H2, W2 = 16, 12          # stride-2 prediction logits
    NQ2, G2, L2 = 6, 4, 3    # queries, padded GT slots, prediction layers
    NPTS = 64

    def _build(self):
        from pctrans_tpu.data.targets import targets_from_labels

        B = 2
        labels = np.zeros((B, self.HF, self.WF), np.int32)
        # 3 disjoint rectangles per image
        labels[:, 2:12, 2:10] = 1
        labels[:, 16:30, 4:12] = 2
        labels[0, 4:14, 14:22] = 3
        labels[1, 18:28, 14:23] = 3
        targets = jax.tree.map(np.asarray,
                               targets_from_labels(jnp.asarray(labels), self.G2))

        rs = np.random.RandomState(3)
        preds = []
        down = labels[:, ::2, ::2]
        for l in range(self.L2):
            p = np.full((B, self.NQ2, self.H2, self.W2), -8.0, np.float32)
            for j in range(3):
                p[:, 2 * j][down == (j + 1)] = 8.0
            p += rs.randn(*p.shape).astype(np.float32) * 0.05 * (l + 1)
            preds.append(p)

        outputs = {
            "pred_masks": jnp.asarray(preds[-1]),
            "aux_masks": [jnp.asarray(p) for p in preds[:-1]],
            "reference_points": jnp.asarray(
                rs.rand(B, self.NQ2, 2).astype(np.float32)),
            "aux_reference_points": [jnp.asarray(
                rs.rand(B, self.NQ2, 2).astype(np.float32))],
            "query_emb": jnp.asarray(rs.randn(B, self.NQ2, 16).astype(np.float32)),
            "sem_mask": jnp.asarray(rs.randn(B, 8, 6, 1).astype(np.float32)),
            "mask_features": jnp.asarray(
                rs.randn(B, 8, 6, 4).astype(np.float32)),
        }
        return outputs, targets, labels

    def _criterion(self):
        from pctrans_tpu.losses.criterion import CriterionConfig, SetCriterion

        return SetCriterion(CriterionConfig(
            num_points=self.NPTS, dec_layers=self.L2,
            sample_dtype="float32", point_select="exact",
            exact_targets=True))

    def test_deterministic_terms_and_assembly(self):
        outputs, targets, _ = self._build()
        crit = self._criterion()
        total, losses = jax.tree.map(
            np.asarray, crit(jax.random.key(5), outputs, targets))

        num_masks = 6.0  # 3 valid instances x 2 images
        q4g = np.array([[0, 2, 4], [0, 2, 4]])  # forced matching
        valid = np.asarray(targets["valid"])[:, :3]
        assert valid.all()

        # loss_refpoints (final) — torch oracle (criterion.py ref :385-400)
        src = torch.from_numpy(np.asarray(outputs["reference_points"]))
        ctr = torch.from_numpy(np.asarray(targets["center_points"]))
        want = sum(
            F.l1_loss(src[b, q4g[b]], ctr[b, :3], reduction="none").sum()
            for b in range(2)) / num_masks
        np.testing.assert_allclose(losses["loss_refpoints"], want,
                                   rtol=1e-5, atol=1e-6)

        # aux refpoints layer 1 uses aux coords [0] with layer-1 indices
        src0 = torch.from_numpy(np.asarray(outputs["aux_reference_points"][0]))
        want1 = sum(
            F.l1_loss(src0[b, q4g[b]], ctr[b, :3], reduction="none").sum()
            for b in range(2)) / num_masks
        np.testing.assert_allclose(losses["loss_refpoints_1"], want1,
                                   rtol=1e-5, atol=1e-6)

        # loss_sem — sigmoid focal oracle at the logits' actual stride
        logits = torch.from_numpy(np.asarray(outputs["sem_mask"]))
        fg = torch.from_numpy(np.asarray(targets["fg_mask"]))
        tgt = fg[:, 2::4, 2::4][..., None]
        p = logits.sigmoid()
        ce = F.binary_cross_entropy_with_logits(logits, tgt, reduction="none")
        p_t = p * tgt + (1 - p) * (1 - tgt)
        focal = (0.25 * tgt + 0.75 * (1 - tgt)) * ce * (1 - p_t) ** 2
        want_sem = focal.sum() / (tgt > 0).sum().float().clamp(min=1.0)
        np.testing.assert_allclose(losses["loss_sem"], want_sem,
                                   rtol=1e-5, atol=1e-6)

        # weight-dict assembly (reference arch/maskformer.py:97-136):
        # aux mask losses at full weight, reid_query_aux at 1.5x, one
        # refpoints per aux layer >= 1
        c = crit.cfg
        w = {}
        for l in range(self.L2):
            mk, dk = ("loss_mask", "loss_dice") if l == self.L2 - 1 else (
                f"loss_mask_{l}", f"loss_dice_{l}")
            w[mk], w[dk] = c.mask_weight, c.dice_weight
        w["loss_refpoints"] = w["loss_refpoints_1"] = c.refpoints_weight
        w["loss_reid_query"] = c.reid_query_weight
        w["loss_reid_query_aux"] = c.reid_query_weight * 1.5
        w["loss_reid_mask"] = c.reid_mask_weight
        w["loss_sem"] = c.sem_weight
        w["loss_emb"] = c.emb_weight
        assert set(w) == set(losses.keys())
        np.testing.assert_allclose(
            total, sum(float(losses[k]) * w[k] for k in w), rtol=1e-5)

    def test_mask_losses_match_pointrend_oracle(self):
        """CE + dice at the SAME sampled points as torch point_sample
        (reference loss_masks :216-285 with detectron2 semantics)."""
        from pctrans_tpu.ops.point_sample import get_uncertain_point_coords

        outputs, targets, _ = self._build()
        crit = self._criterion()
        rng = jax.random.key(11)
        total, losses = jax.tree.map(np.asarray,
                                     crit(rng, outputs, targets))

        # replay the criterion's RNG stream (criterion.py __call__)
        k_match, k_points, k_reid = jax.random.split(rng, 3)
        point_keys = jax.random.split(k_points, self.L2)

        q4g = np.array([[0, 2, 4], [0, 2, 4], [1, 1, 1], [1, 1, 1]]).reshape(
            2, 2, 3)[0]  # [B, 3]; padded slots land on arbitrary queries
        all_preds = [np.asarray(m) for m in outputs["aux_masks"]] + [
            np.asarray(outputs["pred_masks"])]
        tgt_masks = np.asarray(targets["masks"])
        valid = np.asarray(targets["valid"])
        num_masks = 6.0
        B, G = valid.shape

        for l in range(self.L2):
            # indices include padded slots; reconstruct the full q4g the
            # criterion used by re-running the matcher deterministically
            from pctrans_tpu.losses.matcher import point_matcher_indices
            match_keys = jax.random.split(k_match, self.L2)
            q4g_full = np.asarray(point_matcher_indices(
                match_keys[l],
                jnp.asarray(all_preds[l]).astype(jnp.float32),
                jnp.asarray(targets["seg"]), jnp.asarray(valid),
                crit.cfg.num_points, crit.cfg.mask_weight,
                crit.cfg.dice_weight))
            assert (q4g_full[:, :3] == q4g).all(), f"matching not forced, layer {l}"

            src = np.take_along_axis(
                all_preds[l], q4g_full[:, :, None, None], axis=1)
            src = src.reshape(B * G, 1, self.H2, self.W2)
            src_est = src[:, :, ::2, ::2]
            coords = np.asarray(get_uncertain_point_coords(
                point_keys[l], jnp.asarray(src_est), crit.cfg.num_points,
                crit.cfg.oversample_ratio, crit.cfg.importance_sample_ratio,
                exact_topk=True))

            # torch side: point_sample both logits and full-res targets
            tsrc = torch.from_numpy(src)
            ttgt = torch.from_numpy(
                tgt_masks[np.arange(B)[:, None], np.arange(G)[None]].reshape(
                    B * G, 1, self.HF, self.WF))
            grid = torch.from_numpy(2 * coords - 1).unsqueeze(2)
            pl = F.grid_sample(tsrc, grid, mode="bilinear",
                               padding_mode="zeros",
                               align_corners=False).squeeze(3).squeeze(1)
            tl = F.grid_sample(ttgt, grid, mode="bilinear",
                               padding_mode="zeros",
                               align_corners=False).squeeze(3).squeeze(1)
            vm = torch.from_numpy(valid.reshape(-1).astype(np.float32))
            ce = F.binary_cross_entropy_with_logits(
                pl, tl, reduction="none").mean(1)
            want_ce = float((ce * vm).sum() / num_masks)
            sig = pl.sigmoid()
            dice = 1 - (2 * (sig * tl).sum(1) + 1) / (
                sig.sum(1) + tl.sum(1) + 1)
            want_dice = float((dice * vm).sum() / num_masks)

            mk, dk = ("loss_mask", "loss_dice") if l == self.L2 - 1 else (
                f"loss_mask_{l}", f"loss_dice_{l}")
            np.testing.assert_allclose(losses[mk], want_ce, rtol=1e-4,
                                       atol=1e-5, err_msg=f"ce layer {l}")
            np.testing.assert_allclose(losses[dk], want_dice, rtol=1e-4,
                                       atol=1e-5, err_msg=f"dice layer {l}")
