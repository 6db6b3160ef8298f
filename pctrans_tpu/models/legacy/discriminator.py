"""3D PatchGAN discriminator (reference connectomics/model/arch/misc.py:7-79).

Five conv-norm-act stages with (an)isotropic kernels and strides (z never
downsampled on anisotropic stages), closing with a 1-channel patch-logit
conv; pairs with :class:`pctrans_tpu.losses.legacy.GANLoss`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import get_legacy_activation, get_legacy_norm, pad_spatial


class Discriminator3D(nn.Module):
    filters: Sequence[int] = (64, 64, 128, 128, 256)
    pad_mode: str = "replicate"
    act_mode: str = "leaky_relu"
    norm_mode: str = "in"
    dilation: int = 1
    is_isotropic: bool = False
    isotropy: Sequence[bool] = (False, False, False, True, True)
    stride_list: Sequence[int] = (2, 2, 2, 2, 1)
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        depth = len(self.filters)
        isotropy = ([True] * depth if self.is_isotropic
                    else list(self.isotropy))
        act = get_legacy_activation(self.act_mode)
        use_bias = self.norm_mode == "none"

        def block(h, ch, k_base, stride, iso, name):
            k = (k_base,) * 3 if iso else (1, k_base, k_base)
            dil = ((self.dilation,) * 3 if iso
                   else (1, self.dilation, self.dilation))
            s = ((stride,) * 3 if (iso or stride == 1)
                 else (1, stride, stride))  # never downsample z anisotropic
            h = pad_spatial(h, k, dil, self.pad_mode)
            h = nn.Conv(ch, k, strides=s, kernel_dilation=dil,
                        padding="VALID", use_bias=use_bias, dtype=self.dtype,
                        name=f"{name}_conv")(h)
            norm = get_legacy_norm(self.norm_mode, ch, self.train)
            if norm is not None:
                h = norm(h)
            return act(h)

        x = block(x, self.filters[0], 5, self.stride_list[0], isotropy[0],
                  "layer0")
        for n in range(1, depth):
            x = block(x, self.filters[n], 3, self.stride_list[n], isotropy[n],
                      f"layer{n}")
        x = pad_spatial(x, (3, 3, 3), (1, 1, 1), self.pad_mode)
        return nn.Conv(1, (3, 3, 3), padding="VALID", use_bias=True,
                       dtype=self.dtype, name="patch_logits")(x).astype(jnp.float32)
