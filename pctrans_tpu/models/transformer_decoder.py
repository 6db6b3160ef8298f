"""Position-guided masked transformer decoder (the PCTrans core), flax/NHWC.

Equivalent of the reference ``MultiScaleMaskedTransformerDecoder``
(maskformer_block/transformer_decoder/mask2former_transformer_decoder.py:
267-645) with its decoupled conditional-DETR attention layers (:47-193) and
custom 2*d_model multi-head attention (attention.py:57-178):

* object queries carry explicit 2D reference points, initialized from the
  learnable query positional embedding via ``ref_point_head`` + sigmoid
  (:530-532) and refined per layer by ``point_embed`` in inverse-sigmoid
  space with a stop-gradient (:583-593);
* per layer, a query sine embedding (temperature 20) modulated by
  ``query_scale`` is *concatenated* per head with the content query, so
  cross-attention runs at 2*d_model for Q/K while values stay at d_model
  (:105-193);
* masks come from a CondInst-style dynamic-conv head: ``controller`` emits
  per-query 1x1-conv weights applied to [relative-coords, mask features]
  (:647-719, 929-979) — expressed here as einsums over a [B, Q] axis instead
  of grouped convolutions;
* the rendered mask of layer i, thresholded at sigmoid 0.5, becomes the
  cross-attention mask of layer i+1, with fully-masked rows reset (:561);
* the three feature levels are visited round-robin (level = i % 3, :560).

Matching and query-contrast item selection live in the loss package (the
reference calls the matcher inside this forward purely to collect indices;
here the criterion recomputes them from the returned per-layer masks, which
is equivalent and keeps the model target-free).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.render_pallas import dynamic_mask_render, render_reference
from ..ops.resize import resize_bilinear
from .layers import (
    MLP,
    ConvNorm,
    gen_sineembed_for_position,
    inverse_sigmoid,
    position_embedding_sine,
    remat_policy,
)

_XAVIER = nn.initializers.xavier_uniform()
_KAIMING_UNIFORM_A1 = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")

NEG_INF = -1e9


def _attention(q, k, v, nheads: int, bias: Optional[jnp.ndarray] = None):
    """Multi-head attention with externally projected q/k/v.

    q, k: [B, Lq/Lk, E]; v: [B, Lk, Ev].  Scaling follows torch
    ``MultiheadAttention``: (E // nheads) ** -0.5 on q.  ``bias`` is an
    additive [B, Lq, Lk] mask (0 or NEG_INF).  Returns [B, Lq, Ev].
    QK/PV matmuls run in the inputs' dtype (bf16 under mixed precision);
    the softmax is always f32.
    """
    B, Lq, E = q.shape
    Lk = k.shape[1]
    Ev = v.shape[-1]
    hd = E // nheads
    q = q.reshape(B, Lq, nheads, hd) * (hd ** -0.5)
    k = k.reshape(B, Lk, nheads, hd)
    v = v.reshape(B, Lk, nheads, Ev // nheads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias[:, None, :, :].astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhe->bqhe", w, v)
    return out.reshape(B, Lq, Ev)


class SelfAttentionLayer(nn.Module):
    """Decoupled self-attention (mask2former_transformer_decoder.py:47-103)."""

    d_model: int
    nheads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos):
        d, dt = self.d_model, self.dtype
        q = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="sa_qcontent_proj")(tgt) + nn.Dense(
            d, kernel_init=_XAVIER, dtype=dt, name="sa_qpos_proj"
        )(query_pos)
        k = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="sa_kcontent_proj")(tgt) + nn.Dense(
            d, kernel_init=_XAVIER, dtype=dt, name="sa_kpos_proj"
        )(query_pos)
        v = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="sa_v_proj")(tgt)
        out = _attention(q, k, v, self.nheads)
        out = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="out_proj")(out)
        return nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt.astype(dt) + out)


class CrossAttentionLayer(nn.Module):
    """Decoupled cross-attention at 2*d_model (:105-193).

    Per head the query is [content (+pos on layer 0) | sine-position] and the
    key is [content | key-position]; values stay at d_model.
    """

    d_model: int
    nheads: int
    points_num: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, query_sine_embed, attn_bias, is_first):
        d, h, dt = self.d_model, self.nheads, self.dtype
        B, Q, _ = tgt.shape
        S = memory.shape[1]

        q_content = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="ca_qcontent_proj")(tgt)
        k_content = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="ca_kcontent_proj")(memory)
        v = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="ca_v_proj")(memory)
        k_pos = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="ca_kpos_proj")(pos)

        if is_first:
            q = q_content + nn.Dense(d, kernel_init=_XAVIER, dtype=dt,
                                     name="ca_qpos_proj")(query_pos)
            k = k_content + k_pos
        else:
            q = q_content
            k = k_content

        sine = nn.Dense(d, kernel_init=_XAVIER, dtype=dt,
                        name="ca_qpos_sine_proj")(query_sine_embed)
        # concat per head: [B, L, h, hd] x2 -> [B, L, 2d]
        hd = d // h
        q = jnp.concatenate(
            [q.reshape(B, Q, h, hd), sine.reshape(B, Q, h, hd)], axis=3
        ).reshape(B, Q, 2 * d)
        k = jnp.concatenate(
            [k.reshape(B, S, h, hd), k_pos.reshape(B, S, h, hd)], axis=3
        ).reshape(B, S, 2 * d)

        out = _attention(q, k, v, h, bias=attn_bias)
        out = nn.Dense(d, kernel_init=_XAVIER, dtype=dt, name="out_proj")(out)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt.astype(dt) + out)


class FFNLayer(nn.Module):
    d_model: int
    dim_feedforward: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt):
        dt = self.dtype
        y = nn.Dense(self.dim_feedforward, kernel_init=_XAVIER, dtype=dt, name="linear1")(tgt)
        y = nn.Dense(self.d_model, kernel_init=_XAVIER, dtype=dt, name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm")(tgt.astype(dt) + y)


def compute_locations(h: int, w: int, stride: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center image coordinates (x, y) of a stride-s map, [h*w, 2]
    (mask2former_transformer_decoder.py:929-942)."""
    xs = jnp.arange(w, dtype=dtype) * stride + stride // 2
    ys = jnp.arange(h, dtype=dtype) * stride + stride // 2
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)


class MultiScaleMaskedTransformerDecoder(nn.Module):
    hidden_dim: int = 128
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 1024
    dec_layers: int = 9             # reference DEC_LAYERS - 1
    mask_dim: int = 16
    points_num: int = 1
    sem_loss_on: bool = True
    sem_norm: str = "SyncBN"
    rel_coord: bool = True
    dynamic_mask_channels: int = 8
    controller_layers: int = 3
    mask_feat_stride: int = 4
    num_feature_levels: int = 3
    # Reference layout emits mask logits 2x-upsampled to stride 2
    # (dynamic_mask_with_coords, reference :714-719).  The upsample is a
    # deterministic bilinear map that adds no information, and sampling the
    # upsampled maps cost 4x more in the criterion (50k hat-FLOPs per point
    # at 224^2 vs 12.5k at 112^2 — measured 175 ms of the train step).  The
    # TPU recipe therefore emits stride-4 logits and lets consumers
    # upsample; set True to reproduce the reference tensor layout exactly.
    upsample2x: bool = False
    train: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"  # layers.remat_policy: full | dots

    def setup(self):
        d = self.hidden_dim
        self.query_feat = self.param("query_feat", nn.initializers.normal(1.0), (self.num_queries, d))
        self.query_embed = self.param("query_embed", nn.initializers.normal(1.0), (self.num_queries, d))
        self.level_embed = self.param("level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, d))

        # remat: recompute attention/FFN layers in the backward pass
        pol = remat_policy(self.remat_policy)
        cross_cls = (nn.remat(CrossAttentionLayer, static_argnums=(7,), policy=pol)
                     if self.remat else CrossAttentionLayer)
        self_cls = (nn.remat(SelfAttentionLayer, policy=pol)
                    if self.remat else SelfAttentionLayer)
        ffn_cls = (nn.remat(FFNLayer, policy=pol)
                   if self.remat else FFNLayer)

        self.cross_layers = [
            cross_cls(d, self.nheads, self.points_num, dtype=self.dtype,
                      name=f"cross{i}")
            for i in range(self.dec_layers)
        ]
        self.self_layers = [
            self_cls(d, self.nheads, dtype=self.dtype, name=f"self{i}")
            for i in range(self.dec_layers)
        ]
        self.ffn_layers = [
            ffn_cls(d, self.dim_feedforward, dtype=self.dtype, name=f"ffn{i}")
            for i in range(self.dec_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")

        zeros = nn.initializers.zeros
        self.ref_point_head = MLP(d, self.points_num * 2, 2, bias_init=zeros, name="ref_point_head")
        self.query_scale = MLP(d * 2, d * 2 * self.points_num, 2, bias_init=zeros, name="query_scale")
        self.point_embed = MLP(d, 2 * self.points_num, 3, bias_init=zeros, name="point_embed")

        # dynamic mask head parameter counts (reference :426-448)
        cin = self.mask_dim + (2 if self.rel_coord else 0)
        ch = self.dynamic_mask_channels
        self.weight_nums = [cin * ch, ch * ch, ch * 1]
        self.bias_nums = [ch, ch, 1]
        self.num_gen_params = sum(self.weight_nums) + sum(self.bias_nums)
        self.controller = MLP(d, self.num_gen_params, 3, bias_init=zeros, name="controller")

        self.mask_head = nn.Conv(
            self.mask_dim, (1, 1),
            kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            dtype=self.dtype, name="mask_head",
        )
        if self.sem_loss_on:
            self.seg_head = [
                ConvNorm(
                    d, (3, 3), norm=self.sem_norm, activation=nn.relu, use_bias=False,
                    train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                    kernel_init=_KAIMING_UNIFORM_A1, name=f"seg_head{i}",
                )
                for i in range(2)
            ]
            prior_prob = 0.01
            bias_value = -math.log((1 - prior_prob) / prior_prob)
            self.sem_logits = nn.Conv(
                1, (1, 1), bias_init=nn.initializers.constant(bias_value), name="sem_logits"
            )

    def __call__(self, x: Sequence[jnp.ndarray], mask_features: jnp.ndarray) -> Dict:
        """x: multi-scale features [res5', res4', res3'], each [B, H, W, C];
        mask_features: [B, Hm, Wm, C] at stride 4."""
        assert len(x) == self.num_feature_levels
        B = x[0].shape[0]
        d = self.hidden_dim

        src, pos, size_list = [], [], []
        for i, xi in enumerate(x):
            _, H, W, _ = xi.shape
            size_list.append((H, W))
            pe = position_embedding_sine(H, W, d // 2).reshape(1, H * W, d)
            pos.append(jnp.broadcast_to(pe, (B, H * W, d)).astype(xi.dtype))
            src.append(xi.reshape(B, H * W, d)
                       + self.level_embed[i][None, None, :].astype(xi.dtype))

        query_embed = jnp.broadcast_to(self.query_embed[None], (B, self.num_queries, d))
        output = jnp.broadcast_to(self.query_feat[None], (B, self.num_queries, d))

        reference_points = jax.nn.sigmoid(self.ref_point_head(query_embed))  # [B, Q, 2p]
        ref_points_list = [reference_points]

        sem_mask = None
        if self.sem_loss_on:
            y = mask_features
            for layer in self.seg_head:
                y = layer(y)
            sem_mask = self.sem_logits(y)  # [B, Hm, Wm, 1]

        mask_feat = self.mask_head(mask_features)  # [B, Hm, Wm, mask_dim]

        predictions_mask = []
        outputs_coords = []

        params = self.controller(output)
        outputs_mask, attn_bias = self.dynamic_mask_with_coords(
            mask_feat, reference_points, params, size_list[0]
        )
        predictions_mask.append(outputs_mask)

        for i in range(self.dec_layers):
            obj_center = reference_points
            sine = gen_sineembed_for_position(obj_center, dim=d)  # [B, Q, 2dp]
            if i != 0:
                sine = sine * self.query_scale(output)

            level = i % self.num_feature_levels
            output = self.cross_layers[i](
                output, src[level], pos[level], query_embed, sine, attn_bias, i == 0
            )
            output = self.self_layers[i](output, query_embed)
            output = self.ffn_layers[i](output)

            # iterative point refinement with stop-gradient (reference :583-593)
            tmp = self.point_embed(output) + inverse_sigmoid(reference_points)
            new_reference_points = jax.nn.sigmoid(tmp)
            if i != self.dec_layers - 1:
                ref_points_list.append(new_reference_points)
            reference_points = jax.lax.stop_gradient(new_reference_points)

            params = self.controller(output)
            outputs_mask, attn_bias = self.dynamic_mask_with_coords(
                mask_feat, new_reference_points, params,
                size_list[(i + 1) % self.num_feature_levels],
            )
            predictions_mask.append(outputs_mask)

            # per-layer refpoint prediction head on the normed output (:606-612)
            decoder_output = self.decoder_norm(output)
            coord = jax.nn.sigmoid(
                self.point_embed(decoder_output) + inverse_sigmoid(ref_points_list[i])
            )
            outputs_coords.append(coord)

        return {
            "pred_masks": predictions_mask[-1],
            "aux_masks": predictions_mask[:-1],          # 9 earlier predictions
            "reference_points": outputs_coords[-1],
            "aux_reference_points": outputs_coords[:-1],  # 8 earlier coords
            "query_emb": output.astype(jnp.float32),      # final layer output (pre-norm)
            "sem_mask": None if sem_mask is None else sem_mask.astype(jnp.float32),
        }

    def dynamic_mask_with_coords(
        self,
        mask_feat: jnp.ndarray,         # [B, Hm, Wm, Cm]
        reference_points: jnp.ndarray,  # [B, Q, 2]
        params: jnp.ndarray,            # [B, Q, num_gen_params]
        attn_size: Tuple[int, int],
    ):
        """Render per-query masks via dynamic 1x1 convs (reference :647-719).

        Returns (mask_logits [B, Q, 2Hm, 2Wm] when ``upsample2x`` else
        [B, Q, Hm, Wm], attn_bias [B, Q, h*w]) where attn_bias is 0 /
        NEG_INF with the fully-masked-row reset applied.
        """
        B, Hm, Wm, Cm = mask_feat.shape
        Q = reference_points.shape[1]
        ch = self.dynamic_mask_channels
        stride = self.mask_feat_stride
        dtype = mask_feat.dtype

        # relative coordinates are raw pixel units (the reference .float()s
        # them, :668-669); computed in f32 so bf16 doesn't quantize positions
        scale = jnp.asarray([Wm * stride, Hm * stride], jnp.float32)
        inst_xy = reference_points[..., :2].astype(jnp.float32) * scale  # [B, Q, 2]

        # split controller output: weights then biases (reference :944-979)
        w_sizes = self.weight_nums
        b_sizes = self.bias_nums
        offs = [0]
        for s in w_sizes + b_sizes:
            offs.append(offs[-1] + s)
        cin = Cm + (2 if self.rel_coord else 0)
        w1 = params[..., offs[0] : offs[1]].reshape(B, Q, ch, cin)
        w2 = params[..., offs[1] : offs[2]].reshape(B, Q, ch, ch)
        w3 = params[..., offs[2] : offs[3]].reshape(B, Q, 1, ch)
        b1 = params[..., offs[3] : offs[4]]
        b2 = params[..., offs[4] : offs[5]]
        b3 = params[..., offs[5] : offs[6]]

        feats = mask_feat.reshape(B, Hm * Wm, Cm)

        # Implementation dispatch (same pattern as ops/msdeform.py): the
        # fused Pallas kernel on TPU EVAL graphs (every intermediate
        # VMEM-resident, only the [B, Q, HW] output touches HBM — the
        # einsum formulation round-trips three ~[B, Q, ch, HW] tensors
        # through HBM per render and was the decoder's dominant eval cost:
        # 2.89 -> 1.22 ms per render at CVPPP eval shapes), einsums
        # elsewhere.  Train graphs keep the einsum path: the kernel's
        # custom-VJP re-derives through the einsum formulation anyway, so
        # under AD it saves only the fwd render while paying a much longer
        # XLA compile (tools_dev/bench_render.py: fwd+bwd kernel 4.9 vs
        # einsum 3.6 ms at eval shapes).  $PCTRANS_RENDER_IMPL overrides.
        impl = os.environ.get("PCTRANS_RENDER_IMPL") or (
            "pallas" if jax.default_backend() == "tpu" and not self.train
            else "einsum")

        if impl == "pallas":
            # Fused kernel: rel coords are re-derived inside (the [B, Q, HW,
            # 2] rel tensor itself — ~266 MB at eval shapes — never exists).
            # Backward re-derives through the einsum formulation
            # (ops/render_pallas._bwd), so remat of the forward is free of
            # the [B, Q, ch, HW] residuals either way.
            def render(feats, inst_xy, w1, w2, w3, b1, b2, b3):
                out = dynamic_mask_render(
                    feats, inst_xy, w1, w2, w3, b1, b2, b3,
                    (Hm, Wm), stride, self.rel_coord)
                # mask logits stay in the compute dtype: the criterion
                # stacks all 10 layers' logits ([L, B, Q, Hm, Wm] — 100 MB
                # in f32 at the 448^2 recipe) and casts f32 only after the
                # G-query gather, so a f32 stack pays double HBM traffic for
                # precision the loss never reads (the reference trains the
                # same tensors in AMP fp16).  f32 configs are unaffected.
                return out.reshape(B, Q, Hm, Wm).astype(dtype)

            if self.remat:
                render = jax.checkpoint(render)
            mask_logits = render(feats, inst_xy, w1, w2, w3, b1, b2, b3)
        else:
            # Batched-einsum formulation: ops/render_pallas.render_reference
            # IS this math (it is also the Pallas kernel's VJP fallback and
            # the bench gate's oracle — one definition keeps all three in
            # lockstep).  Input channel order [rel_coords(2), mask_feats(Cm)]
            # (reference :672); the rel contribution runs f32 (coordinates),
            # features in the compute dtype.  (A hand-unrolled "fused
            # elementwise" XLA variant — 64 broadcast-multiply terms — was
            # tried to save the two [B, Q, ch, HW] HBM round trips, but
            # measured 115.6 vs 75.7 ms for the whole eval step on v5e: XLA
            # schedules the unrolled DAG as many small fusions that re-read
            # x.  The Pallas path above is that fusion done properly, in
            # VMEM.)
            def render(feats, inst_xy, w1, w2, w3, b1, b2, b3):
                out = render_reference(
                    feats, inst_xy, w1, w2, w3, b1, b2, b3,
                    hw=(Hm, Wm), stride=stride, rel_coord=self.rel_coord,
                    dtype=dtype)
                # compute-dtype output: see the pallas branch note (the f32
                # cast inside render_reference fuses away against this)
                return out.reshape(B, Q, Hm, Wm).astype(dtype)

            if self.remat:  # the [B, Q, ch, HW] tensors dominate memory
                render = jax.checkpoint(render)
            mask_logits = render(feats, inst_xy, w1, w2, w3, b1, b2, b3)

        # attention mask for the next layer
        attn = resize_bilinear(mask_logits, attn_size)            # [B, Q, h, w]
        masked = jax.nn.sigmoid(attn) < 0.5                       # True = don't attend
        masked = masked.reshape(B, Q, -1)
        all_masked = jnp.all(masked, axis=-1, keepdims=True)      # row reset (:561)
        masked = jnp.where(all_masked, False, masked)
        attn_bias = jax.lax.stop_gradient(
            jnp.where(masked, jnp.asarray(NEG_INF, dtype), jnp.asarray(0.0, dtype))
        )

        if self.upsample2x:
            mask_logits = resize_bilinear(mask_logits, (Hm * 2, Wm * 2))
        return mask_logits, attn_bias
