"""DETR-style standard transformer decoder head.

Equivalent of the reference ``StandardTransformerDecoder``
(maskformer_block/transformer_decoder/maskformer_transformer_decoder.py:31-188)
and the DETR ``Transformer`` it wraps (transformer_decoder/transformer.py),
registered under ``MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME`` but unused by
the trained PCTrans configs.

The decoder runs ``enc_layers`` encoder layers over the input feature map
(usually zero — the pixel decoder already encodes) and ``dec_layers`` decoder
layers over ``num_queries`` learned query embeddings; each layer's queries
are projected by a 3-layer MLP to ``mask_dim`` and contracted with the pixel
embedding to produce mask logits (maskformer_transformer_decoder.py:146-151).
Post-norm layers; dropout omitted (config default ``DROPOUT = 0.0``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .fpn_decoder import TransformerEncoderLayerPostNorm
from .layers import MLP, position_embedding_sine

_XAVIER = nn.initializers.xavier_uniform()


class TransformerDecoderLayerPostNorm(nn.Module):
    """One DETR decoder layer (transformer.py TransformerDecoderLayer,
    ``normalize_before=False``): query self-attention, cross-attention to the
    memory, FFN — each with a residual + LayerNorm."""

    d_model: int
    nheads: int
    d_ffn: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, pos):
        q = k = tgt + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nheads, qkv_features=self.d_model,
            out_features=self.d_model, kernel_init=_XAVIER, dtype=self.dtype,
            name="self_attn",
        )(q, k, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + attn)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nheads, qkv_features=self.d_model,
            out_features=self.d_model, kernel_init=_XAVIER, dtype=self.dtype,
            name="multihead_attn",
        )(tgt + query_pos, memory + pos, memory)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + attn)
        y = nn.Dense(self.d_ffn, kernel_init=_XAVIER, dtype=self.dtype,
                     name="linear1")(tgt)
        y = nn.Dense(self.d_model, kernel_init=_XAVIER, dtype=self.dtype,
                     name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + y)


class StandardTransformerDecoder(nn.Module):
    """DETR transformer predictor producing per-query mask logits.

    ``__call__(x, mask_features)`` with ``x`` [B, H, W, C_in] (the feature the
    transformer attends over) and ``mask_features`` [B, Hm, Wm, mask_dim]
    returns a dict with ``pred_masks`` [B, Q, Hm, Wm], ``aux_masks`` (list of
    earlier-layer masks when ``deep_supervision``), and ``pred_logits``
    [B, Q, num_classes + 1] when ``mask_classification``.
    """

    hidden_dim: int = 128
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 1024
    enc_layers: int = 0
    dec_layers: int = 10
    mask_dim: int = 16
    num_classes: int = 1
    mask_classification: bool = True
    deep_supervision: bool = True
    enforce_input_project: bool = False
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask_features: jnp.ndarray):
        B, H, W, C = x.shape
        dtype = self.dtype
        x = x.astype(dtype)
        if C != self.hidden_dim or self.enforce_input_project:
            x = nn.Conv(self.hidden_dim, (1, 1), kernel_init=_XAVIER,
                        dtype=dtype, name="input_proj")(x)
        src = x.reshape(B, H * W, self.hidden_dim)
        pos = position_embedding_sine(H, W, self.hidden_dim // 2)
        pos = pos.reshape(1, H * W, self.hidden_dim).astype(dtype)

        for li in range(self.enc_layers):
            src = TransformerEncoderLayerPostNorm(
                self.hidden_dim, self.nheads, self.dim_feedforward,
                dtype=dtype, name=f"encoder_layer{li}",
            )(src, pos)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim),
        ).astype(dtype)
        query_pos = jnp.broadcast_to(
            query_embed[None], (B, self.num_queries, self.hidden_dim))
        tgt = jnp.zeros_like(query_pos)  # transformer.py: tgt = zeros_like(query_embed)

        decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")  # shared across layers
        intermediate = []
        for li in range(self.dec_layers):
            tgt = TransformerDecoderLayerPostNorm(
                self.hidden_dim, self.nheads, self.dim_feedforward,
                dtype=dtype, name=f"decoder_layer{li}",
            )(tgt, query_pos, src, pos)
            intermediate.append(decoder_norm(tgt))

        mask_embed_mlp = MLP(self.hidden_dim, self.mask_dim, 3, dtype=dtype,
                             name="mask_embed")
        mf = mask_features.astype(dtype)
        out = {}
        if self.mask_classification:
            class_embed = nn.Dense(self.num_classes + 1, kernel_init=_XAVIER,
                                   dtype=dtype, name="class_embed")
            out["pred_logits"] = class_embed(intermediate[-1]).astype(jnp.float32)

        def masks_of(hs):
            emb = mask_embed_mlp(hs)                       # [B, Q, mask_dim]
            m = jnp.einsum("bqc,bhwc->bqhw", emb, mf)
            return m.astype(jnp.float32)

        if self.deep_supervision:
            all_masks = [masks_of(hs) for hs in intermediate]
            out["pred_masks"] = all_masks[-1]
            out["aux_masks"] = all_masks[:-1]
            if self.mask_classification:
                out["aux_logits"] = [
                    class_embed(hs).astype(jnp.float32) for hs in intermediate[:-1]
                ]
        else:
            out["pred_masks"] = masks_of(intermediate[-1])
            out["aux_masks"] = []
        return out
