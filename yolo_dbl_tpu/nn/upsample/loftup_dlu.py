"""LoftUp coordinate-based upsampler and the official DLUPack (NHWC, flax).

Reference parity: modules_upsample/LoftUp/{upsamplers.py:13 LoftUp,
layers.py ImplicitFeaturizer/MinMaxScaler/CATransformer} and
modules_upsample/DLU_official.py:66 DLUPack (deformable-grid CARAFE).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.resample import grid_sample_bilinear, nearest_upsample, pixel_shuffle
from .fade_sapa import carafe_apply

Dtype = Any


def min_max_scale(x, eps=1e-4):
    """Per-channel global min-max to [-0.5, 0.5] (LoftUp layers.py:59)."""
    lo = x.min(axis=(0, 1, 2), keepdims=True)
    hi = x.max(axis=(0, 1, 2), keepdims=True)
    return (x - lo) / jnp.clip(hi - lo, eps) - 0.5


class ImplicitFeaturizer(nn.Module):
    """Fourier positional features of an image/grid (LoftUp layers.py:71):
    sin/cos of exp-spaced frequencies times (grid[, color]) with learned
    phase biases."""

    color_feats: bool = True
    n_freqs: int = 10
    learn_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        d = 2 + (c if self.color_feats else 0)
        gh = jnp.linspace(-1, 1, h)
        gw = jnp.linspace(-1, 1, w)
        grid = jnp.stack(jnp.meshgrid(gh, gw, indexing="ij"), -1)  # (H, W, 2)
        feats = jnp.broadcast_to(grid[None], (b, h, w, 2))
        if self.color_feats:
            feats = jnp.concatenate([feats, x], -1)  # (B, H, W, d)
        freqs = jnp.exp(jnp.linspace(-2, 10, self.n_freqs))
        f = feats[..., None, :] * freqs[:, None]  # (B, H, W, n, d)
        if self.learn_bias:
            biases = self.param("biases", nn.initializers.normal(1.0), (2, d, self.n_freqs))
            sin_f = f + jnp.transpose(biases[0])[None, None, None]
            cos_f = f + jnp.transpose(biases[1])[None, None, None]
        else:
            sin_f = cos_f = f
        sin_f = jnp.sin(sin_f).reshape(b, h, w, self.n_freqs * d)
        cos_f = jnp.cos(cos_f).reshape(b, h, w, self.n_freqs * d)
        parts = [sin_f, cos_f] + ([x] if self.color_feats else [])
        return jnp.concatenate(parts, -1)


class _ChannelLayerNorm(nn.Module):
    """ConvNeXt-style channel LayerNorm with affine (LoftUp layers.py:36)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        u = x.mean(-1, keepdims=True)
        s = ((x - u) ** 2).mean(-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + 1e-6)
        return x * self.param("weight", nn.initializers.ones, (c,)) + self.param(
            "bias", nn.initializers.zeros, (c,))


class CATransformer(nn.Module):
    """Cross-attention transformer (LoftUp layers.py:170): depth× full-MHA
    cross-attn + FFN, both residual."""

    dim: int
    depth: int = 2
    heads: int = 4
    mlp_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv):
        for i in range(self.depth):
            qq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_norm_q")(q)
            kk = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_norm_kv")(kv)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim,
                dtype=self.dtype, name=f"l{i}_attn")(qq, kk, kk)
            q = attn + q
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_ff_ln")(q)
            y = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"l{i}_ff1")(y)
            y = nn.Dense(self.dim, dtype=self.dtype, name=f"l{i}_ff2")(nn.gelu(y))
            q = y + q
        return q


class LoftUp(nn.Module):
    """Coordinate-network feature upsampler (LoftUp upsamplers.py:13):
    Fourier features of the high-res image become queries, low-res features
    (+ sine PE) become keys/values; a small cross-attention transformer
    emits features at image resolution."""

    dim: int
    color_feats: bool = True
    n_freqs: int = 20
    num_heads: int = 4
    num_layers: int = 2
    lr_pe_type: str = "sine"
    lr_size: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lr_feats, img, train: bool = False):
        assert self.lr_pe_type in ("sine", "learnable")
        pe_dim = 2 * 5 * 2 if self.lr_pe_type == "sine" else 0
        dt = self.dim + pe_dim

        x = min_max_scale(img)
        x = ImplicitFeaturizer(self.color_feats, self.n_freqs, learn_bias=True,
                               dtype=self.dtype, name="fourier")(x)
        x = _ChannelLayerNorm(dtype=self.dtype, name="cn")(x)
        for i in range(2):
            x = nn.Conv(dt, (3, 3), dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"fbn{i}")(x)
            x = nn.relu(x)
        b, h, w, _ = x.shape
        q = x.reshape(b, h * w, dt)

        bl, hl, wl, cl = lr_feats.shape
        if self.lr_pe_type == "sine":
            pe = ImplicitFeaturizer(False, 5, learn_bias=True, dtype=self.dtype,
                                    name="lr_pe")(lr_feats)
            kv = jnp.concatenate([lr_feats, pe], -1).reshape(bl, hl * wl, dt)
        else:
            pe = self.param("lr_pe", nn.initializers.normal(1.0),
                            (1, self.lr_size * self.lr_size, self.dim))
            if hl * wl != pe.shape[1]:
                side = int(np.sqrt(pe.shape[1]))
                pe2 = jax.image.resize(pe.reshape(1, side, side, self.dim),
                                       (1, hl, wl, self.dim), "bicubic")
                pe = pe2.reshape(1, hl * wl, self.dim)
            kv = lr_feats.reshape(bl, hl * wl, cl) + pe

        y = CATransformer(dt, self.num_layers, self.num_heads, self.dim,
                          dtype=self.dtype, name="ca")(q, kv)
        y = y.reshape(b, h, w, dt)
        if self.lr_pe_type == "sine":
            y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="final_conv")(y)
        return _ChannelLayerNorm(dtype=self.dtype, name="final_ln")(y)


class DLUPack(nn.Module):
    """Official deformable-lattice upsampler (DLU_official.py:66): CARAFE
    whose per-output-pixel kernels are grid-sampled from the low-res kernel
    field at learned sub-pixel offsets (zero-init → starts as plain CARAFE
    with nearest kernel lookup)."""

    channels: int
    scale_factor: int = 2
    up_kernel: int = 5
    up_group: int = 1
    encoder_kernel: int = 3
    compressed_channels: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, k = self.scale_factor, self.up_kernel
        comp = nn.Conv(self.compressed_channels, (1, 1), dtype=self.dtype,
                       name="channel_compressor")(x)
        p = self.encoder_kernel // 2
        mask = nn.Conv(k * k * self.up_group, (self.encoder_kernel,) * 2,
                       padding=p, kernel_init=nn.initializers.normal(0.001),
                       dtype=self.dtype, name="kernel_space_generator")(comp)
        offset = nn.Conv(2 * s * s * self.up_group, (self.encoder_kernel,) * 2,
                         padding=p, kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, name="conv_offset")(comp)

        # normalize kernels over k² at low resolution
        mask = jax.nn.softmax(mask.reshape(b, h, w, -1, 1), axis=-2).reshape(b, h, w, k * k)

        # deformable kernel lookup: base align-corners grid + learned offsets
        off = pixel_shuffle(offset, s)  # (B, H*s, W*s, 2), xy
        off = jnp.stack([off[..., 0] * 2.0 / (w - 1), off[..., 1] * 2.0 / (h - 1)], -1)
        gy = jnp.repeat(jnp.linspace(-1, 1, h), s)
        gx = jnp.repeat(jnp.linspace(-1, 1, w), s)
        base = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1)[None]  # (1, Hs, Ws, 2)
        grid = base + off
        mask_hi = grid_sample_bilinear(mask, grid, padding_mode="border",
                                       align_corners=True)  # (B, Hs, Ws, k²)
        return carafe_apply(x, mask_hi, k, s)
