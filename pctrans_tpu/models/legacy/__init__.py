"""Legacy pytorch_connectomics model zoo (flax, channels-last).

TPU-native equivalents of the reference's non-MaskFormer architectures,
selectable through ``MODEL.ARCHITECTURE`` exactly like the reference
``MODEL_MAP`` (connectomics/model/build.py:8-20):

  unet_3d / unet_2d           arch/unet.py:14,226
  unet_plus_3d / unet_plus_2d arch/unet.py:185,345
  fpn_3d                      arch/fpn.py
  deeplabv3a/b/c              arch/deeplab.py
  unet_residual_3d            arch/resunet_limx.py

plus the backbones they build on (backbone/resnet.py, repvgg.py, botnet.py,
efficientnet.py) and the block zoo (model/block/).

Layout convention: 2D models take [B, H, W, C]; 3D models take
[B, D, H, W, C] (channels-last; the reference is channels-first).
"""

from .blocks import (
    BasicBlock,
    BasicBlockPA,
    BasicBlockSE,
    ConvNormAct,
    NonLocalBlock,
    SELayer,
    get_legacy_activation,
    get_legacy_norm,
    linear_resize,
)
from .botnet import BotNet3D
from .deeplab import DeepLabV3
from .discriminator import Discriminator3D
from .efficientnet import EfficientNet3D
from .fpn3d import FPN3D
from .repvgg import RepVGG3D, RepVGGBlock3D, repvgg_convert
from .resnet_legacy import ResNet2D, ResNet3D
from .resunet import UNetResidual3D
from .unet import UNet2D, UNet3D, UNetPlus2D, UNetPlus3D

MODEL_MAP = {
    "unet_3d": UNet3D,
    "unet_2d": UNet2D,
    "fpn_3d": FPN3D,
    "unet_plus_3d": UNetPlus3D,
    "unet_plus_2d": UNetPlus2D,
    "deeplabv3a": DeepLabV3,
    "deeplabv3b": DeepLabV3,
    "deeplabv3c": DeepLabV3,
    "unet_residual_3d": UNetResidual3D,
}
