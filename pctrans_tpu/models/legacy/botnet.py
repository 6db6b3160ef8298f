"""BotNet-3D backbone (reference connectomics/model/backbone/botnet.py:15-364).

ResNet3D layers 0-3 + a ``BottleStack`` stage 4: three bottleneck blocks
whose 3x3 conv is replaced by multi-head self-attention over all spatial
positions with a learned 2D (h, w) position embedding shared across z
(the reference offers relative or absolute embeddings — lucidrains'
bottleneck-transformer port, botnet.py:137-251; the absolute variant
(:174-196) is implemented here and noted as such), average-pool
downsampling between blocks when ``downsample``.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BasicBlock, BasicBlockSE, ConvNormAct, get_legacy_activation, get_legacy_norm

_BLOCKS = {"residual": BasicBlock, "residual_se": BasicBlockSE}


class BotAttention(nn.Module):
    """MHSA over (z*h*w) tokens with learned (h, w) absolute position
    embedding added to the keys/queries' content (botnet.py Attention:198+
    with AbsPosEmb:174-196)."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, Z, H, W, C]
        B, Z, H, W, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1, 1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, Z * H * W, 3 * inner), 3, axis=-1)

        emb_h = self.param("pos_emb_h", nn.initializers.normal(self.dim_head ** -0.5),
                           (H, self.dim_head))
        emb_w = self.param("pos_emb_w", nn.initializers.normal(self.dim_head ** -0.5),
                           (W, self.dim_head))
        pos = (emb_h[:, None, :] + emb_w[None, :, :]).reshape(H * W, self.dim_head)
        pos = jnp.tile(pos, (Z, 1)).astype(self.dtype)  # shared across z

        hd = self.dim_head
        q = q.reshape(B, -1, self.heads, hd) * (hd ** -0.5)
        k = k.reshape(B, -1, self.heads, hd)
        v = v.reshape(B, -1, self.heads, hd)
        content = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        posattn = jnp.einsum("bqhd,kd->bhqk", q, pos)
        attn = nn.softmax((content + posattn).astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        return out.reshape(B, Z, H, W, inner)


class BottleBlock(nn.Module):
    dim_out: int
    proj_factor: int = 2
    heads: int = 4
    dim_head: int = 32
    downsample: bool = False
    act_mode: str = "elu"
    norm_mode: str = "bn"
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_legacy_activation(self.act_mode)
        mid = self.dim_out // self.proj_factor
        shared = dict(spatial_rank=3, norm_mode=self.norm_mode,
                      act_mode=self.act_mode, train=self.train,
                      dtype=self.dtype)
        y = ConvNormAct(mid, 1, name="conv_in", **shared)(x)
        y = BotAttention(self.heads, self.dim_head, dtype=self.dtype,
                         name="attn")(y)
        if self.downsample:
            y = nn.avg_pool(y, (1, 2, 2), strides=(1, 2, 2))
        norm = get_legacy_norm(self.norm_mode, y.shape[-1], self.train)
        if norm is not None:
            y = norm(y)
        y = act(y)
        y = ConvNormAct(self.dim_out, 1, act_mode="none", spatial_rank=3,
                        norm_mode=self.norm_mode, train=self.train,
                        dtype=self.dtype, name="conv_out")(y)
        shortcut = x
        if self.downsample:
            shortcut = nn.avg_pool(shortcut, (1, 2, 2), strides=(1, 2, 2))
        if shortcut.shape[-1] != self.dim_out:
            shortcut = ConvNormAct(self.dim_out, 1, act_mode="none",
                                   spatial_rank=3, norm_mode=self.norm_mode,
                                   train=self.train, dtype=self.dtype,
                                   name="shortcut")(shortcut)
        return act(y + shortcut)


class BotNet3D(nn.Module):
    """ResNet3D stages 0-3 + 3-block BottleStack stage 4 (botnet.py:15-101)."""

    block_type: str = "residual"
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    blocks: Sequence[int] = (2, 2, 2, 2)
    isotropy: Sequence[bool] = (False, False, False, True, True)
    pad_mode: str = "replicate"
    act_mode: str = "elu"
    norm_mode: str = "bn"
    feature_keys: Sequence[str] = ("feat1", "feat2", "feat3", "feat4", "feat5")
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        block_cls = _BLOCKS[self.block_type]
        shared = dict(spatial_rank=3, pad_mode=self.pad_mode,
                      act_mode=self.act_mode, norm_mode=self.norm_mode,
                      train=self.train, dtype=self.dtype)
        k0 = (5, 5, 5) if self.isotropy[0] else (1, 5, 5)
        x = ConvNormAct(self.filters[0], k0, name="layer0", **shared)(x)
        feats = {self.feature_keys[0]: x}
        for s in range(1, len(self.filters) - 1):
            iso = self.isotropy[s]
            stride = 2 if iso else (1, 2, 2)
            x = block_cls(self.filters[s], strides=stride, isotropic=iso,
                          name=f"layer{s}_block0", **shared)(x)
            for b in range(1, self.blocks[s - 1]):
                x = block_cls(self.filters[s], isotropic=iso,
                              name=f"layer{s}_block{b}", **shared)(x)
            feats[self.feature_keys[s]] = x
        # BottleStack: 3 attention bottlenecks, downsample in the first
        for b in range(3):
            x = BottleBlock(self.filters[-1], downsample=b == 0,
                            act_mode=self.act_mode, norm_mode=self.norm_mode,
                            train=self.train, dtype=self.dtype,
                            name=f"layer4_block{b}")(x)
        feats[self.feature_keys[len(self.filters) - 1]] = x
        return feats
