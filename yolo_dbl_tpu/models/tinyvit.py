"""TinyViT — MobileSAM image encoder (NHWC, flax).

Reference parity: models/sam/modules/tiny_encoder.py (Conv2d_BN:24,
PatchEmbed:62, MBConv:104, PatchMerging:165, ConvLayer:222, Mlp:315,
Attention:363 with trainable spatial attention biases, TinyViTBlock:492,
BasicLayer:650, TinyViT:765) as built for MobileSAM
(sam/build.py:56 build_mobile_sam — dims (64,128,160,320), depths
(2,2,6,2), heads (2,4,5,10), windows (7,7,14,7), 256-d SAM neck).

The classifier head exists upstream (num_classes=1000) but MobileSAM uses
only forward_features; both are provided.
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .sam import LayerNorm2d

Dtype = Any


class ConvBN(nn.Module):
    """conv (no bias) + BN (tiny_encoder.py:24 Conv2d_BN)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int = 0
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=self.p, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="c")(x)
        return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(x)


class TinyPatchEmbed(nn.Module):
    """Two stride-2 ConvBN+GELU stages → /4 (tiny_encoder.py:62)."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.gelu(ConvBN(self.embed_dim // 2, 3, 2, 1, dtype=self.dtype, name="c1")(x, train))
        return ConvBN(self.embed_dim, 3, 2, 1, dtype=self.dtype, name="c2")(x, train)


class TinyMBConv(nn.Module):
    """Inverted bottleneck with zero-init output BN (tiny_encoder.py:104)."""

    dim: int
    expand_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.dim * self.expand_ratio)
        y = nn.gelu(ConvBN(hidden, 1, dtype=self.dtype, name="conv1")(x, train))
        y = nn.gelu(ConvBN(hidden, 3, 1, 1, groups=hidden, dtype=self.dtype, name="conv2")(y, train))
        y = ConvBN(self.dim, 1, dtype=self.dtype, name="conv3")(y, train)
        return nn.gelu(x + y)


class TinyPatchMerging(nn.Module):
    """1x1 → dw 3x3 (stride 2, or 1 at 320/448/576) → 1x1
    (tiny_encoder.py:165); tokens in, tokens out."""

    dim: int
    out_dim: int
    input_resolution: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:
            h, w = self.input_resolution
            x = x.reshape(x.shape[0], h, w, -1)
        stride = 1 if self.out_dim in (320, 448, 576) else 2
        x = nn.gelu(ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x, train))
        x = nn.gelu(ConvBN(self.out_dim, 3, stride, 1, groups=self.out_dim,
                           dtype=self.dtype, name="conv2")(x, train))
        x = ConvBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(x, train)
        return x.reshape(x.shape[0], -1, self.out_dim)


class TinyAttention(nn.Module):
    """MHA with trainable per-offset attention biases (tiny_encoder.py:363)."""

    dim: int
    key_dim: int
    num_heads: int = 8
    attn_ratio: float = 1.0
    resolution: Tuple[int, int] = (7, 7)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        kd = self.key_dim
        nh = self.num_heads
        d = int(self.attn_ratio * kd)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(nh * (2 * kd + d), dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, nh, 2 * kd + d)
        q, k, v = qkv[..., :kd], qkv[..., kd:2 * kd], qkv[..., 2 * kd:]

        pts = list(itertools.product(range(self.resolution[0]), range(self.resolution[1])))
        offsets, idxs = {}, []
        for p1 in pts:
            for p2 in pts:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                offsets.setdefault(off, len(offsets))
                idxs.append(offsets[off])
        biases = self.param("attention_biases", nn.initializers.zeros, (nh, len(offsets)))
        bias = biases[:, jnp.asarray(np.asarray(idxs).reshape(len(pts), len(pts)))]

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * kd**-0.5 + bias[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, nh * d)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Windowed attention + depthwise local conv + MLP (tiny_encoder.py:492)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    local_conv_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = self.input_resolution
        b, hw, c = x.shape
        ws = self.window_size
        res = x
        attn = TinyAttention(c, c // self.num_heads, self.num_heads, 1.0,
                             (ws, ws), dtype=self.dtype, name="attn")
        if h == ws and w == ws:
            x = attn(x)
        else:
            xm = x.reshape(b, h, w, c)
            pb, pr = (ws - h % ws) % ws, (ws - w % ws) % ws
            xm = jnp.pad(xm, ((0, 0), (0, pb), (0, pr), (0, 0)))
            ph, pw = h + pb, w + pr
            xm = xm.reshape(b, ph // ws, ws, pw // ws, ws, c).swapaxes(2, 3)
            xm = xm.reshape(-1, ws * ws, c)
            xm = attn(xm)
            xm = xm.reshape(b, ph // ws, pw // ws, ws, ws, c).swapaxes(2, 3)
            x = xm.reshape(b, ph, pw, c)[:, :h, :w].reshape(b, hw, c)
        x = res + x
        xm = x.reshape(b, h, w, c)
        xm = ConvBN(c, self.local_conv_size, 1, self.local_conv_size // 2,
                    groups=c, dtype=self.dtype, name="local_conv")(xm, train)
        x = xm.reshape(b, hw, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp_norm")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(nn.gelu(y))
        return x + y


class TinyViT(nn.Module):
    """MobileSAM encoder (tiny_encoder.py:765): MBConv stage + 3 transformer
    stages with patch merging, 256-channel SAM neck. __call__ returns the
    (B, img/16, img/16, 256) embedding; `classify` runs the 1000-way head."""

    img_size: int = 1024
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    num_classes: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, with_head: bool = False):
        pr = self.img_size // 4
        x = TinyPatchEmbed(self.embed_dims[0], dtype=self.dtype, name="patch_embed")(x, train)
        # stage 0: MBConvs (+ merge)
        for i in range(self.depths[0]):
            x = TinyMBConv(self.embed_dims[0], self.mbconv_expand_ratio,
                           dtype=self.dtype, name=f"l0_b{i}")(x, train)
        tokens = TinyPatchMerging(self.embed_dims[0], self.embed_dims[1], (pr, pr),
                                  dtype=self.dtype, name="l0_ds")(x, train)
        # stages 1..3
        for s in range(1, len(self.depths)):
            r = pr // (2 ** (s - 1 if s == 3 else s))
            for i in range(self.depths[s]):
                tokens = TinyViTBlock(self.embed_dims[s], (r, r), self.num_heads[s],
                                      self.window_sizes[s], self.mlp_ratio,
                                      dtype=self.dtype, name=f"l{s}_b{i}")(tokens, train)
            if s < len(self.depths) - 1:
                tokens = TinyPatchMerging(self.embed_dims[s], self.embed_dims[s + 1],
                                          (r, r), dtype=self.dtype, name=f"l{s}_ds")(tokens, train)
        b, n, c = tokens.shape
        g = pr // 4
        feat = tokens.reshape(b, g, g, c)
        y = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(feat)
        y = LayerNorm2d(dtype=self.dtype, name="neck_ln1")(y)
        y = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_conv2")(y)
        y = LayerNorm2d(dtype=self.dtype, name="neck_ln2")(y)
        logits = None
        if self.num_classes > 0:
            # classification head exists upstream too (tiny_encoder.py:840)
            t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_head")(tokens.mean(axis=1))
            logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(t)
        return (y, logits) if with_head else y


def build_mobile_sam_encoder(img_size: int = 1024, dtype=jnp.float32) -> TinyViT:
    """MobileSAM TinyViT-5M configuration (reference build.py:56)."""
    return TinyViT(img_size=img_size, dtype=dtype)
