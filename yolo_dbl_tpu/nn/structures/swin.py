"""Swin Transformer backbone stages (NHWC, flax.linen).

Reference parity (nn/structures/Swin_Transformer.py): PatchEmbed (:386),
PatchMerging (:426), SwinStage (:298) with shifted-window attention
(WindowAttention :109 with relative position bias, SwinTransformerBlock
:206). The shift mask is built from static shapes at trace time — a
constant folded into the compiled program instead of the reference's
per-forward mask allocation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def window_partition(x, ws: int):
    """(B, H, W, C) → (B·nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(wins, ws: int, h: int, w: int):
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA attention mask (reference Swin_Transformer.py:343 create_mask)."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wss, :] = cnt
            cnt += 1
    wins = img.reshape(1, h // ws, ws, w // ws, ws, 1).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference :109)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # x: (B·nW, N, C) with N = ws²
        bnw, n, c = x.shape
        hd = c // self.num_heads
        ws = self.window_size
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = bias_table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinTransformerBlock(nn.Module):
    """LN → (S)W-MSA → LN → MLP, both residual (reference :206)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C); pad to window multiple
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size if min(h, w) > ws else 0
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hp, wp, ws, shift))
        else:
            mask = None
        wins = window_partition(y, ws).reshape(-1, ws * ws, c)
        wins = WindowAttention(self.dim, ws, self.num_heads, dtype=self.dtype, name="attn")(
            wins, mask, train
        )
        y = window_reverse(wins.reshape(-1, ws, ws, c), ws, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(z)
        return x + z


class SwinStage(nn.Module):
    """depth× SwinTransformerBlock, alternating shift (reference :298)."""

    dim: int
    c2: int
    depth: int
    num_heads: int
    window_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.dim == self.c2, "SwinStage keeps channels"
        for i in range(self.depth):
            x = SwinTransformerBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                dtype=self.dtype, name=f"blk{i}",
            )(x, train)
        return x


class PatchEmbed(nn.Module):
    """Patch embedding conv (reference :386)."""

    embed_dim: int = 96
    patch_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        b, h, w, c = x.shape
        pad_h = (p - h % p) % p
        pad_w = (p - w % p) % p
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        y = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)


class PatchMerging(nn.Module):
    """2×2 concat + LN + linear reduce to 2C (reference :426)."""

    dim: int
    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.c2 == 2 * self.dim
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(y)
