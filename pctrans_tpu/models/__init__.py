"""Model zoo: backbone, pixel decoders, transformer decoders, meta-arch.

All modules are flax.linen, channels-last (TPU-native), static shapes.

Flagship path (the trained PCTrans configs): ResNet-50 ->
MSDeformAttnPixelDecoder -> MultiScaleMaskedTransformerDecoder, assembled by
:class:`PCTransModel`.  Alternative registered components mirror the
reference registries:

* pixel decoders (MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME):
  ``MSDeformAttnPixelDecoder`` (default), ``BasePixelDecoder``,
  ``TransformerEncoderPixelDecoder`` (reference pixel_decoder/fpn.py:38,205)
* transformer decoders (MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME):
  ``MultiScaleMaskedTransformerDecoder`` (default),
  ``StandardTransformerDecoder`` (maskformer_transformer_decoder.py:31)
* per-pixel baseline heads (MODEL.SEM_SEG_HEAD.NAME):
  ``PerPixelBaselineHead``, ``PerPixelBaselinePlusHead``
  (per_pixel_baseline.py:18,127)
* the legacy zoo (MODEL.ARCHITECTURE, reference MODEL_MAP
  model/build.py:8-20): see :mod:`pctrans_tpu.models.legacy`.

``build_architecture(cfg)`` is the config-driven entry point mirroring the
reference ``build_model`` dispatch (model/build.py:23-69).
"""

from .detr_decoder import StandardTransformerDecoder
from .fpn_decoder import BasePixelDecoder, TransformerEncoderPixelDecoder
from .pctrans import ModelConfig, PCTransModel, build_model_config
from .per_pixel import PerPixelBaselineHead, PerPixelBaselinePlusHead


def build_architecture(cfg, train: bool = True):
    """Config-driven model dispatch (reference model/build.py:23-69).

    ``MODEL.ARCHITECTURE == 'MaskFormer'`` returns a :class:`PCTransModel`
    built from the MASK_FORMER/SEM_SEG_HEAD keys; legacy names dispatch into
    :data:`pctrans_tpu.models.legacy.MODEL_MAP` with the reference's kwargs
    (BLOCK_TYPE, IN_PLANES, OUT_PLANES, FILTERS, ISOTROPY, PAD_MODE,
    ACT_MODE, NORM_MODE...).
    """
    arch = cfg.MODEL.ARCHITECTURE
    if arch == "MaskFormer":
        return PCTransModel(config=build_model_config(cfg), train=train)

    from .legacy import MODEL_MAP

    if arch not in MODEL_MAP:
        raise ValueError(f"Unknown MODEL.ARCHITECTURE: {arch}")
    kwargs = dict(
        in_channel=cfg.MODEL.IN_PLANES,
        out_channel=cfg.MODEL.OUT_PLANES,
        filters=tuple(cfg.MODEL.FILTERS),
        pad_mode=cfg.MODEL.PAD_MODE,
        act_mode=cfg.MODEL.ACT_MODE,
        norm_mode={"sync_bn": "bn"}.get(cfg.MODEL.NORM_MODE, cfg.MODEL.NORM_MODE),
        train=train,
    )
    if arch in ("unet_3d", "unet_2d", "unet_plus_3d", "unet_plus_2d"):
        kwargs.update(
            block_type=cfg.MODEL.BLOCK_TYPE,
            is_isotropic=cfg.DATASET.IS_ISOTROPIC,
            isotropy=tuple(cfg.MODEL.ISOTROPY),
            pooling=cfg.MODEL.POOLING_LAYER,
        )
    elif arch == "fpn_3d":
        kwargs.update(
            backbone_type=cfg.MODEL.BACKBONES,
            block_type=cfg.MODEL.BLOCK_TYPE,
            blocks=tuple(cfg.MODEL.BLOCKS),
            is_isotropic=cfg.DATASET.IS_ISOTROPIC,
            isotropy=tuple(cfg.MODEL.ISOTROPY),
            deploy=cfg.MODEL.DEPLOY_MODE,
        )
    elif arch.startswith("deeplab"):
        kwargs.pop("in_channel")
        kwargs.pop("filters")
        kwargs.update(name_variant=arch, aux_out=cfg.MODEL.AUX_OUT)
    elif arch == "unet_residual_3d":
        kwargs.update(
            do_embedding=cfg.MODEL.EMBEDDING == 1,
            head_depth=cfg.MODEL.HEAD_DEPTH,
        )
    return MODEL_MAP[arch](**kwargs)
