"""Swin Transformer backbone (flax, channels-last).

Equivalent of the reference's alternative backbone
(maskformer_block/backbone/swin.py: WindowAttention:74-171,
SwinTransformerBlock:174-295, PatchMerging:298-338, BasicLayer:340-453,
PatchEmbed:456-496, SwinTransformer:498-685, D2SwinTransformer:687-770),
registered behind ``MODEL.BACKBONE.NAME == 'D2SwinTransformer'`` but unused
by the trained PCTrans configs.

Swin-T defaults (embed 96, depths 2/2/6/2, heads 3/6/12/24, window 7).
Returns the ``{"res2".."res5"}`` feature dict at strides 4/8/16/32 in NHWC.

TPU notes: window partition/reverse are pure reshapes (static shapes);
cyclic shifts are ``jnp.roll``; the shifted-window attention mask is a
compile-time numpy constant per (H, W).  Stochastic depth (drop-path) uses a
per-sample broadcast dropout under the ``dropout`` RNG collection.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_TRUNC02 = nn.initializers.truncated_normal(stddev=0.02)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, ws*ws, C] (swin.py:44-55)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)


def window_reverse(wins: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """[B*nW, ws*ws, C] -> [B, H, W, C] (swin.py:58-71)."""
    C = wins.shape[-1]
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, C)


def _relative_position_index(ws: int) -> np.ndarray:
    """Pairwise relative-position index table (swin.py:110-120)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                 # [N, N]


def _shift_attn_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """0/-100 mask for shifted windows (swin.py:413-438); [nW, N, N]."""
    img = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    wins = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swin.py:74-171)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray]) -> jnp.ndarray:
        Bn, N, C = x.shape
        H = self.num_heads
        hd = C // H
        scale = self.qk_scale or hd ** -0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)

        table = self.param(
            "relative_position_bias_table", _TRUNC02,
            ((2 * self.window_size - 1) ** 2, H))
        idx = _relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(N, N, H)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None].astype(jnp.float32)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, H, N, N) + jnp.asarray(
                mask, jnp.float32)[None, :, None]
            attn = attn.reshape(Bn, H, N, N)
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """One (shifted-)window transformer block (swin.py:174-295)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: float = 0.0
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        H, W = hw
        B, L, C = x.shape
        ws = self.window_size
        shift = self.shift_size
        if min(H, W) <= ws:  # window larger than map: no partition shift
            shift, ws = 0, min(ws, min(H, W))

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(B, H, W, C)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        mask = None
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(Hp, Wp, ws, shift)

        wins = window_partition(x, ws)
        wins = WindowAttention(C, ws, self.num_heads, self.qkv_bias,
                               self.qk_scale, dtype=self.dtype,
                               name="attn")(wins, mask)
        x = window_reverse(wins, ws, Hp, Wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = x.reshape(B, L, C)

        def drop_path(h):
            if self.drop_path == 0.0:
                return h
            return nn.Dropout(self.drop_path, broadcast_dims=(1, 2))(
                h, deterministic=not self.train)

        x = shortcut + drop_path(x)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), kernel_init=_TRUNC02,
                     dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.Dense(C, kernel_init=_TRUNC02, dtype=self.dtype,
                     name="mlp_fc2")(nn.gelu(y))
        return x + drop_path(y)


class PatchMerging(nn.Module):
    """2x2 patch merging: norm -> concat 4 neighbors -> linear 2C
    (swin.py:298-338)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        H, W = hw
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
             x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, kernel_init=_TRUNC02,
                        dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Hierarchical Swin backbone returning {res2..res5} NHWC features
    (swin.py:498-685 + the D2 wrapper :687-770)."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rate: float = 0.3
    ape: bool = False
    patch_norm: bool = True
    pretrain_img_size: int = 224
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    train: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        B, H0, W0, _ = images.shape
        ps = self.patch_size
        x = images.astype(self.dtype)
        if H0 % ps or W0 % ps:
            x = jnp.pad(x, ((0, 0), (0, (ps - H0 % ps) % ps),
                            (0, (ps - W0 % ps) % ps), (0, 0)))
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps),
                    dtype=self.dtype, name="patch_embed")(x)
        B, Wh, Ww, C = x.shape
        x = x.reshape(B, Wh * Ww, C)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        if self.ape:
            pe = self.param("absolute_pos_embed", _TRUNC02,
                            (1, (self.pretrain_img_size // ps) ** 2, C))
            # interpolated APE omitted for non-pretrain sizes; reference
            # bicubic-interpolates (swin.py:660-666)
            if pe.shape[1] == x.shape[1]:
                x = x + pe

        num_layers = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = {}
        hw = (Wh, Ww)
        blk_id = 0
        for li in range(num_layers):
            dim = int(self.embed_dim * 2 ** li)
            for bi in range(self.depths[li]):
                x = SwinBlock(
                    dim, self.num_heads[li], self.window_size,
                    shift_size=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, drop_path=float(dpr[blk_id]),
                    train=self.train, dtype=self.dtype,
                    name=f"layer{li}_block{bi}")(x, hw)
                blk_id += 1
            name = f"res{li + 2}"
            if name in self.out_features:
                y = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{li}")(x)
                outs[name] = y.reshape(B, hw[0], hw[1], dim)
            if li < num_layers - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"downsample{li}")(x, hw)
                hw = ((hw[0] + 1) // 2, (hw[1] + 1) // 2)
        return outs
