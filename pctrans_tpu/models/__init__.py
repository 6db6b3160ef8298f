"""Model zoo: backbone, pixel decoder, transformer decoder, meta-architecture.

All modules are flax.linen, NHWC layout (TPU-native), static shapes.
"""

from .pctrans import PCTransModel, build_model_config, ModelConfig
