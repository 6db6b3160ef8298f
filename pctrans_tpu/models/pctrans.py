"""PCTrans meta-architecture (reference ``MaskFormer``, arch/maskformer.py:22-257).

backbone -> pixel decoder -> transformer decoder.  The model is target-free:
it always returns the full output dict (per-layer masks, refined reference
points, final query embeddings, semantic logits, pixel embedding); the
criterion consumes it during training and the inference postprocessor during
eval.  Loss weighting and matching live in :mod:`pctrans_tpu.losses`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .pixel_decoder import MSDeformAttnPixelDecoder
from .resnet import ResNet
from .transformer_decoder import MultiScaleMaskedTransformerDecoder


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    hidden_dim: int = 128
    conv_dim: int = 128
    mask_dim: int = 16
    num_queries: int = 100
    nheads: int = 8
    dim_feedforward: int = 1024
    enc_layers: int = 6
    dec_layers: int = 9            # cfg DEC_LAYERS - 1 (reference :491)
    points_num: int = 1
    sem_loss_on: bool = True
    rel_coord: bool = True
    backbone_depth: int = 50
    backbone_norm: str = "FrozenBN"
    head_norm: str = "SyncBN"      # FPN + seg-head norm
    stride_in_1x1: bool = False
    enc_points: int = 4
    # Component selection (reference registries: MODEL.BACKBONE.NAME,
    # MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME).  The trained configs use the
    # defaults; D2SwinTransformer / BasePixelDecoder /
    # TransformerEncoderPixelDecoder are the registered alternatives.
    backbone_name: str = "build_resnet_backbone"
    pixel_decoder_name: str = "MSDeformAttnPixelDecoder"
    # Replicate the published FPN operand swap (stride-8 mask features;
    # pixel_decoder.MSDeformAttnPixelDecoder.fpn_legacy_swap docstring).
    # Default False = upstream Mask2Former stride-4 fusion (finer masks).
    fpn_legacy_swap: bool = False
    # MODEL.SEM_SEG_HEAD.NAME: only MaskFormerHead composes into this
    # meta-arch (the per-pixel baselines are standalone heads with a
    # semantic-only output contract; instantiate them directly)
    sem_seg_head_name: str = "MaskFormerHead"
    # MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME registry
    # (maskformer_transformer_decoder.py:16-27): the PCTrans decoder, or the
    # plain DETR StandardTransformerDecoder over the encoder-top features
    # (criterion note: only the PCTrans decoder emits reference points /
    # contrast items, so training the DETR variant needs a masks-only loss)
    transformer_decoder_name: str = "MultiScaleMaskedTransformerDecoder"
    swin_embed_dim: int = 96
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    swin_num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    swin_window_size: int = 7
    swin_drop_path: float = 0.3
    # Input normalization (reference MaskFormer registers pixel_mean/std and
    # applies (x - mean) / std in forward, arch/maskformer.py; the trained
    # configs use mean 0 / std 255 ON TOP of the dataset transforms' own
    # normalization — a published quirk reproduced when loading those YAMLs).
    # Neutral defaults keep programmatic ModelConfig() use untouched.
    pixel_mean: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    pixel_std: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Emit reference-layout stride-2 mask logits (2x bilinear upsample of
    # the stride-4 render) instead of the TPU default stride-4; see
    # transformer_decoder.MultiScaleMaskedTransformerDecoder.upsample2x.
    upsample2x: bool = False
    # Rematerialize encoder/decoder layers in the backward pass (HBM for
    # FLOPs: without it the 448^2 batch-2 train step needs ~18G of 16G HBM).
    remat: bool = True
    # What the remat saves: "full" recomputes everything, "dots" keeps
    # matmul/conv outputs and recomputes only elementwise chains
    # (layers.remat_policy).
    remat_policy: str = "full"
    # Mixed precision (the reference trains under AMP, engine/trainer.py:140):
    # "bfloat16" runs matmuls/convs on the MXU at bf16 with f32 params, f32
    # norms/softmax and f32 outputs.  bf16's exponent range matches f32, so
    # the reference's fp16-motivated fp32-forced pixel-decoder region
    # (msdeformattn.py:314 @autocast(enabled=False)) is not needed; sampling
    # locations stay f32 regardless (bf16's 8-bit mantissa would quantize
    # pixel coordinates by ~0.25px).
    dtype: str = "float32"


def build_model_config(cfg) -> ModelConfig:
    """Extract a ModelConfig from a YACS-style config tree."""
    mf = cfg.MODEL.MASK_FORMER
    sh = cfg.MODEL.SEM_SEG_HEAD
    sw = cfg.MODEL.get("SWIN", None)
    swin_kwargs = {}
    if sw is not None:
        swin_kwargs = dict(
            swin_embed_dim=sw.EMBED_DIM,
            swin_depths=tuple(sw.DEPTHS),
            swin_num_heads=tuple(sw.NUM_HEADS),
            swin_window_size=sw.WINDOW_SIZE,
            swin_drop_path=sw.DROP_PATH_RATE,
        )
    return ModelConfig(
        hidden_dim=mf.HIDDEN_DIM,
        conv_dim=sh.CONVS_DIM,
        mask_dim=sh.MASK_DIM,
        num_queries=mf.NUM_OBJECT_QUERIES,
        nheads=mf.NHEADS,
        dim_feedforward=mf.DIM_FEEDFORWARD,
        enc_layers=sh.TRANSFORMER_ENC_LAYERS,
        dec_layers=mf.DEC_LAYERS - 1,
        points_num=mf.POSITION_POINTS_NUM,
        sem_loss_on=mf.SEMANTIC_LOSS_ON,
        rel_coord=mf.REL_COORD,
        backbone_depth=cfg.MODEL.RESNETS.DEPTH,
        backbone_norm=cfg.MODEL.RESNETS.NORM,
        head_norm=sh.NORM,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        backbone_name=cfg.MODEL.BACKBONE.NAME,
        pixel_decoder_name=sh.PIXEL_DECODER_NAME,
        sem_seg_head_name=sh.get("NAME", "MaskFormerHead"),
        transformer_decoder_name=mf.get(
            "TRANSFORMER_DECODER_NAME", "MultiScaleMaskedTransformerDecoder"),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype="bfloat16" if cfg.MODEL.MIXED_PRECESION else "float32",
        upsample2x=cfg.MODEL.MASK_FORMER.TPU_RECIPE.UPSAMPLE2X,
        fpn_legacy_swap=bool(sh.get("FPN_LEGACY_SWAP", False)),
        remat=bool(cfg.MODEL.MASK_FORMER.TPU_RECIPE.get("REMAT", True)),
        remat_policy=str(cfg.MODEL.MASK_FORMER.TPU_RECIPE.get("REMAT_POLICY", "full")),
        **swin_kwargs,
    )


class PCTransModel(nn.Module):
    """Full PCTrans network.

    __call__(images [B, H, W, 3]) -> dict with keys:
      pred_masks           [B, Q, H/4, W/4]   final mask logits (stride 4;
                                              the reference emits a 2x
                                              bilinear upsample of the same
                                              logits — see the decoder's
                                              ``upsample2x`` flag)
      aux_masks            list of 9 earlier  [B, Q, H/4, W/4]
      reference_points     [B, Q, 2]
      aux_reference_points list of 8          [B, Q, 2]
      query_emb            [B, Q, C]
      sem_mask             [B, H/4, W/4, 1] or None
      mask_features        [B, H/4, W/4, C]   pixel embedding (for the
                                              discriminative loss)
    """

    config: ModelConfig = ModelConfig()
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, Any]:
        c = self.config
        dtype = jnp.dtype(c.dtype)
        # (x - pixel_mean) / pixel_std (reference arch/maskformer.py forward)
        if tuple(c.pixel_mean) != (0.0, 0.0, 0.0) or tuple(c.pixel_std) != (1.0, 1.0, 1.0):
            mean = jnp.asarray(c.pixel_mean, jnp.float32)
            std = jnp.asarray(c.pixel_std, jnp.float32)
            images = (images - mean) / std
        if c.backbone_name == "D2SwinTransformer":
            from .swin import SwinTransformer

            feats = SwinTransformer(
                embed_dim=c.swin_embed_dim,
                depths=c.swin_depths,
                num_heads=c.swin_num_heads,
                window_size=c.swin_window_size,
                drop_path_rate=c.swin_drop_path,
                train=self.train,
                dtype=dtype,
                name="backbone",
            )(images.astype(dtype))
        else:  # 'build_resnet_backbone' (the trained recipe)
            feats = ResNet(
                depth=c.backbone_depth,
                stride_in_1x1=c.stride_in_1x1,
                norm=c.backbone_norm,
                train=self.train,
                axis_name=self.axis_name,
                dtype=dtype,
                name="backbone",
            )(images.astype(dtype))

        if c.sem_seg_head_name != "MaskFormerHead":
            raise ValueError(
                f"MODEL.SEM_SEG_HEAD.NAME={c.sem_seg_head_name!r}: only "
                "MaskFormerHead composes into PCTransModel; the per-pixel "
                "baselines (models/per_pixel.py) are standalone semantic "
                "heads — instantiate them directly.")
        if c.pixel_decoder_name == "MSDeformAttnPixelDecoder":
            mask_features, enc_top, multi_scale = MSDeformAttnPixelDecoder(
                conv_dim=c.conv_dim,
                mask_dim=c.mask_dim,
                norm=c.head_norm,
                transformer_layers=c.enc_layers,
                n_heads=c.nheads,
                n_points=c.enc_points,
                train=self.train,
                axis_name=self.axis_name,
                dtype=dtype,
                remat=c.remat,
                remat_policy=c.remat_policy,
                fpn_legacy_swap=c.fpn_legacy_swap,
                name="pixel_decoder",
            )(feats)
        else:
            from .fpn_decoder import BasePixelDecoder, TransformerEncoderPixelDecoder

            if c.pixel_decoder_name == "BasePixelDecoder":
                decoder = BasePixelDecoder(
                    conv_dim=c.conv_dim, mask_dim=c.mask_dim, norm=c.head_norm,
                    train=self.train, axis_name=self.axis_name, dtype=dtype,
                    name="pixel_decoder")
            elif c.pixel_decoder_name == "TransformerEncoderPixelDecoder":
                decoder = TransformerEncoderPixelDecoder(
                    conv_dim=c.conv_dim, mask_dim=c.mask_dim, norm=c.head_norm,
                    nheads=c.nheads, d_ffn=c.dim_feedforward,
                    transformer_enc_layers=c.enc_layers, train=self.train,
                    axis_name=self.axis_name, dtype=dtype,
                    name="pixel_decoder")
            else:
                raise ValueError(
                    f"Unknown pixel decoder: {c.pixel_decoder_name}")
            mask_features, enc_top, multi_scale = decoder(feats)
            # FPN decoders emit multi-scale maps at conv_dim but the PCTrans
            # transformer decoder's mask head needs mask_dim features; both
            # contracts match the reference (MaskFormerHead feeds
            # (multi_scale, mask_features) either way).

        if c.transformer_decoder_name == "StandardTransformerDecoder":
            # plain DETR predictor over the encoder-top features (reference
            # maskformer_transformer_decoder.py:31; registry row in
            # TRANSFORMER_DECODER_REGISTRY) — masks only, no PCTrans
            # reference points / contrast items
            from .detr_decoder import StandardTransformerDecoder

            out = StandardTransformerDecoder(
                hidden_dim=c.hidden_dim,
                num_queries=c.num_queries,
                nheads=c.nheads,
                dim_feedforward=c.dim_feedforward,
                dec_layers=c.dec_layers + 1,
                # the mask-embed width must match the pixel decoder's actual
                # mask_features channels (MSDeformAttnPixelDecoder emits
                # conv_dim; the FPN decoders project to mask_dim)
                mask_dim=mask_features.shape[-1],
                train=self.train,
                dtype=dtype,
                name="predictor",
            )(enc_top, mask_features)
            out["mask_features"] = mask_features.astype(jnp.float32)
            return out
        if c.transformer_decoder_name != "MultiScaleMaskedTransformerDecoder":
            raise ValueError(
                f"Unknown transformer decoder: {c.transformer_decoder_name}")
        out = MultiScaleMaskedTransformerDecoder(
            hidden_dim=c.hidden_dim,
            num_queries=c.num_queries,
            nheads=c.nheads,
            dim_feedforward=c.dim_feedforward,
            dec_layers=c.dec_layers,
            mask_dim=c.mask_dim,
            points_num=c.points_num,
            sem_loss_on=c.sem_loss_on,
            sem_norm=c.head_norm,
            rel_coord=c.rel_coord,
            upsample2x=c.upsample2x,
            train=self.train,
            axis_name=self.axis_name,
            dtype=dtype,
            remat=c.remat,
            remat_policy=c.remat_policy,
            name="predictor",
        )(multi_scale, mask_features)

        # losses and postprocess consume f32 regardless of the compute dtype
        out["mask_features"] = mask_features.astype(jnp.float32)
        return out
