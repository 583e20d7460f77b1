"""EQSR — HAT (Hybrid Attention Transformer) super-resolution upsampler
(NHWC, flax).

Reference parity: modules_upsample/EQSR/hat_arch.py (HAT:697, RHAG:528,
AttenBlocks:433, HAB:193, OCAB:344, CAB:58, WindowAttention:124,
Upsample:675); exported there as `EQSR`. Structure: shallow conv → stacked
residual hybrid attention groups (windowed self-attention with relative
position bias and shifted windows, a parallel channel-attention conv branch
scaled by conv_scale, plus one overlapping cross-attention block per group)
→ body conv + global residual → pixel-shuffle reconstruction.

Stochastic depth (drop_path) is treated as identity — it only affects
training regularization, not the architecture.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.resample import pixel_shuffle

Dtype = Any


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws, h, w, c):
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, c)


def _rpi_sa(ws: int) -> np.ndarray:
    """Self-attention relative position index (hat_arch.py:864)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = np.transpose(rel, (1, 2, 0)).copy()
    rel += ws - 1
    rel[..., 0] *= 2 * ws - 1
    return rel.sum(-1)


def _rpi_oca(ws: int, ow: int) -> np.ndarray:
    """OCA relative position index (hat_arch.py:877)."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(ow), np.arange(ow), indexing="ij")).reshape(2, -1)
    rel = ce[:, None, :] - co[:, :, None]
    rel = np.transpose(rel, (1, 2, 0)).copy()
    rel += ws - ow + 1
    rel[..., 0] *= ws + ow - 1
    return rel.sum(-1)


def _shift_mask(h, w, ws, ss) -> np.ndarray:
    """SW-MSA window mask, 0 / -100 (hat_arch.py:902 calculate_mask)."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img[hs, wsl] = cnt
            cnt += 1
    wins = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class ChannelAttention(nn.Module):
    """RCAN channel attention (hat_arch.py:37)."""

    num_feat: int
    squeeze: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.relu(nn.Conv(self.num_feat // self.squeeze, (1, 1), dtype=self.dtype, name="d")(y))
        y = nn.sigmoid(nn.Conv(self.num_feat, (1, 1), dtype=self.dtype, name="u")(y))
        return x * y


class CAB(nn.Module):
    """Conv + channel attention branch (hat_arch.py:58)."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.gelu(nn.Conv(self.num_feat // self.compress_ratio, (3, 3), dtype=self.dtype, name="c1")(x))
        y = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name="c2")(y)
        return ChannelAttention(self.num_feat, self.squeeze_factor, dtype=self.dtype, name="ca")(y)


class _WindowAttention(nn.Module):
    """W-MSA with relative position bias (hat_arch.py:124)."""

    dim: int
    ws: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xw, mask=None):
        b_, n, c = xw.shape
        nh = self.num_heads
        d = c // nh
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xw)
        qkv = qkv.reshape(b_, n, 3, nh, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b_, n, nh, d)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k)
        table = self.param("rpb_table", nn.initializers.normal(0.02),
                           ((2 * self.ws - 1) ** 2, nh))
        bias = jnp.transpose(table[jnp.asarray(_rpi_sa(self.ws))], (2, 0, 1))
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(b_, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class HAB(nn.Module):
    """Hybrid attention block (hat_arch.py:193): (S)W-MSA + conv_scale·CAB
    + MLP, both residual."""

    dim: int
    num_heads: int
    ws: int = 7
    shift: int = 0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        conv_x = CAB(c, self.compress_ratio, self.squeeze_factor, dtype=self.dtype, name="cab")(y)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        wins = _window_partition(y, self.ws)
        wins = _WindowAttention(self.dim, self.ws, self.num_heads, dtype=self.dtype,
                                name="attn")(wins, mask if self.shift > 0 else None)
        y = _window_reverse(wins, self.ws, h, w, c)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y + conv_x * self.conv_scale
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(z)
        z = nn.Dense(c, dtype=self.dtype, name="fc2")(nn.gelu(z))
        return x + z


class OCAB(nn.Module):
    """Overlapping cross-attention block (hat_arch.py:344)."""

    dim: int
    ws: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.ws
        ow = int(ws * self.overlap_ratio) + ws
        nh = self.num_heads
        d = c // nh
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, kv = qkv[..., :c], qkv[..., c:]
        qw = _window_partition(q, ws)  # (nwb, ws², c)
        p = (ow - ws) // 2
        kvp = jnp.pad(kv, ((0, 0), (p, p), (p, p), (0, 0)))
        iy = jnp.arange(h // ws) * ws
        ix = jnp.arange(w // ws) * ws
        patches = [kvp[:, dy + iy][:, :, dx + ix]
                   for dy in range(ow) for dx in range(ow)]
        kvw = jnp.stack(patches, axis=3).reshape(b * (h // ws) * (w // ws), ow * ow, 2, c)
        k, v = kvw[..., 0, :], kvw[..., 1, :]
        qh = qw.reshape(-1, ws * ws, nh, d)
        kh = k.reshape(-1, ow * ow, nh, d)
        vh = v.reshape(-1, ow * ow, nh, d)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh * (d ** -0.5), kh)
        table = self.param("rpb_table", nn.initializers.normal(0.02), ((ws + ow - 1) ** 2, nh))
        bias = jnp.transpose(table[jnp.asarray(_rpi_oca(ws, ow))], (2, 0, 1))
        attn = jax.nn.softmax(attn + bias[None], axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(-1, ws * ws, c)
        y = _window_reverse(out, ws, h, w, c)
        x = nn.Dense(c, dtype=self.dtype, name="proj")(y) + shortcut
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(z)
        z = nn.Dense(c, dtype=self.dtype, name="fc2")(nn.gelu(z))
        return x + z


class RHAG(nn.Module):
    """Residual hybrid attention group (hat_arch.py:528): depth× HAB +
    one OCAB + 3×3 conv, residual."""

    dim: int
    depth: int
    num_heads: int
    ws: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        y = x
        for i in range(self.depth):
            y = HAB(self.dim, self.num_heads, self.ws,
                    0 if i % 2 == 0 else self.ws // 2,
                    self.compress_ratio, self.squeeze_factor, self.conv_scale,
                    self.mlp_ratio, dtype=self.dtype, name=f"hab{i}")(y, mask)
        y = OCAB(self.dim, self.ws, self.overlap_ratio, self.num_heads,
                 dtype=self.dtype, name="ocab")(y)
        return nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="conv")(y) + x


class EQSR(nn.Module):
    """HAT super-resolution network (hat_arch.py:697, exported as EQSR).

    __call__(x (B, H, W, in_chans)) → (B, H·upscale, W·upscale, in_chans).
    H and W must be multiples of window_size (the torch original pads; pad
    upstream if needed).
    """

    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6)
    window_size: int = 7
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    upscale: int = 2
    img_range: float = 1.0
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        assert h % self.window_size == 0 and w % self.window_size == 0, \
            "input spatial dims must be multiples of window_size"
        mean = (jnp.array([0.4488, 0.4371, 0.4040]) if c == 3 else jnp.zeros((1,)))
        x = (x - mean) * self.img_range

        feat = nn.Conv(self.embed_dim, (3, 3), dtype=self.dtype, name="conv_first")(x)
        mask = jnp.asarray(_shift_mask(h, w, self.window_size, self.window_size // 2))
        y = feat
        for i, (dep, nh) in enumerate(zip(self.depths, self.num_heads)):
            y = RHAG(self.embed_dim, dep, nh, self.window_size, self.compress_ratio,
                     self.squeeze_factor, self.conv_scale, self.overlap_ratio,
                     self.mlp_ratio, dtype=self.dtype, name=f"rhag{i}")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(y)
        y = nn.Conv(self.embed_dim, (3, 3), dtype=self.dtype, name="conv_after_body")(y) + feat

        y = nn.Conv(self.num_feat, (3, 3), dtype=self.dtype, name="conv_before_upsample")(y)
        y = nn.leaky_relu(y, 0.01)
        s = self.upscale
        if s == 3:
            y = nn.Conv(9 * self.num_feat, (3, 3), dtype=self.dtype, name="up0")(y)
            y = pixel_shuffle(y, 3)
        else:
            assert s & (s - 1) == 0, "scale must be 2^n or 3"
            for i in range(int(np.log2(s))):
                y = nn.Conv(4 * self.num_feat, (3, 3), dtype=self.dtype, name=f"up{i}")(y)
                y = pixel_shuffle(y, 2)
        y = nn.Conv(self.in_chans, (3, 3), dtype=self.dtype, name="conv_last")(y)
        return y / self.img_range + mean
