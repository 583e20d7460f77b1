"""Attention pool, batch 3 (NHWC, flax.linen).

Reference parity (nn/modules_attention/): AIFI transformer encoder layer
with 2-D sincos position embedding (AIFIAttention.py:353), ASFF/ASFFmobile
adaptive spatial feature fusion (ASFF.py:266,198), PSAModule pyramid split
attention (EPSANet.py:34), CPCA channel-prior conv attention (CPCANet.py:77
RepBlock — note the deliberately SHARED 1×1 conv used at three points —
and :119 CPCA_YOLO wrapper).
"""

from __future__ import annotations

import math
from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import max_pool, nearest_upsample
from ..common import Conv2d

Dtype = Any


def sincos_2d_position(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2-D sine-cosine position embedding (reference AIFIAttention.py:369).
    Returns (1, H*W, dim). grid_w varies fastest per the torch meshgrid('ij')
    + flatten order."""
    assert dim % 4 == 0
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim) / pos_dim))
    gw, gh = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="ij")
    out_w = gw.reshape(-1, 1) * omega[None]
    out_h = gh.reshape(-1, 1) * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )[None]


class TorchMHA(nn.Module):
    """Multi-head attention in torch ``nn.MultiheadAttention`` parameter
    layout — packed ``in_proj_weight`` (3C, C) / ``in_proj_bias`` and an
    ``out_proj`` Linear — so reference checkpoints port mechanically
    (utils/port.py raw-leaf branch). Math is standard scaled-dot-product."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        c = q.shape[-1]
        hd = c // self.num_heads
        w_in = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * c, c), jnp.float32)
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,), jnp.float32)
        w_in, b_in = w_in.astype(self.dtype), b_in.astype(self.dtype)
        qh = q @ w_in[:c].T + b_in[:c]
        kh = k @ w_in[c:2 * c].T + b_in[c:2 * c]
        vh = v @ w_in[2 * c:].T + b_in[2 * c:]
        b, n = qh.shape[0], qh.shape[1]
        split = lambda t: t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        qh, kh, vh = split(qh), split(kh), split(vh)
        attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class AIFI(nn.Module):
    """RT-DETR intra-scale transformer encoder layer (reference
    nn/modules/transformer.py:86 — the variant parse_model actually binds,
    with ``ma``/``fc1``/``fc2`` children): post-norm MHA with pos added to
    q/k, GELU FFN."""

    c1: int
    num_heads: int = 8
    cm: int = 2048
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # torch flatten(2) of NCHW tokens: position (y, x) order with x fastest;
        # the reference's pos embedding is built W-major then applied to the
        # H-major token order — reproduce the token order faithfully (row-major HW)
        tokens = x.reshape(b, h * w, c)
        pos = sincos_2d_position(w, h, c)  # reference passes (w, h) swapped into its builder
        q = k = tokens + pos.astype(tokens.dtype)
        attn = TorchMHA(self.num_heads, dtype=self.dtype, name="ma")(q, k, tokens)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tokens + attn)
        y = nn.Dense(self.cm, dtype=self.dtype, name="fc1")(tokens)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU() is the erf form
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tokens + y)
        return tokens.reshape(b, h, w, c)


class _AddConv(nn.Module):
    """conv + BN + leaky/relu6 (reference ASFF.py add_conv)."""

    c2: int
    k: int = 3
    s: int = 1
    leaky: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.k - 1) // 2
        y = Conv2d(self.c2, self.k, s=self.s, p=p, bias=False, dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(y)
        return nn.leaky_relu(y, 0.1) if self.leaky else jnp.clip(y, 0, 6)


class ASFF(nn.Module):
    """Adaptively spatial feature fusion over 3 levels (reference ASFF.py:266).
    Level dims (512, 256, 256); takes [x_l0(P5), x_l1(P4), x_l2(P3)]."""

    level: int
    rfb: bool = False
    dims: tuple = (512, 256, 256)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        x0, x1, x2 = xs
        inter = self.dims[self.level]
        if self.level == 0:
            l0 = x0
            l1 = _AddConv(inter, 3, 2, dtype=self.dtype, name="stride_l1")(x1, train)
            l2 = max_pool(x2, 3, 2, 1)
            l2 = _AddConv(inter, 3, 2, dtype=self.dtype, name="stride_l2")(l2, train)
            expand_c = 1024
        elif self.level == 1:
            l0 = _AddConv(inter, 1, 1, dtype=self.dtype, name="compress_l0")(x0, train)
            l0 = nearest_upsample(l0, 2)
            l1 = x1
            l2 = _AddConv(inter, 3, 2, dtype=self.dtype, name="stride_l2")(x2, train)
            expand_c = 512
        else:
            l0 = _AddConv(inter, 1, 1, dtype=self.dtype, name="compress_l0")(x0, train)
            l0 = nearest_upsample(l0, 4)
            l1 = _AddConv(inter, 1, 1, dtype=self.dtype, name="compress_l1")(x1, train)
            l1 = nearest_upsample(l1, 2)
            l2 = x2
            expand_c = 256
        cc = 8 if self.rfb else 16
        w0 = _AddConv(cc, 1, 1, dtype=self.dtype, name="w_l0")(l0, train)
        w1 = _AddConv(cc, 1, 1, dtype=self.dtype, name="w_l1")(l1, train)
        w2 = _AddConv(cc, 1, 1, dtype=self.dtype, name="w_l2")(l2, train)
        wgt = Conv2d(3, 1, dtype=self.dtype, name="weight_levels")(jnp.concatenate([w0, w1, w2], -1))
        wgt = jax.nn.softmax(wgt, axis=-1)
        fused = l0 * wgt[..., 0:1] + l1 * wgt[..., 1:2] + l2 * wgt[..., 2:3]
        return _AddConv(expand_c, 3, 1, dtype=self.dtype, name="expand")(fused, train)


class ASFFmobile(ASFF):
    """Mobile variant: dims (512, 256, 128), relu6 convs (reference ASFF.py:198)."""

    dims: tuple = (512, 256, 128)


class PSAModule(nn.Module):
    """Pyramid split attention (reference EPSANet.py:34): 4 multi-kernel
    grouped convs + shared SE weighting + cross-branch softmax."""

    planes: int
    conv_kernels: tuple = (3, 5, 7, 9)
    stride: int = 1
    conv_groups: tuple = (1, 4, 8, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        sc = self.planes // 4
        branches = []
        for i, (k, g) in enumerate(zip(self.conv_kernels, self.conv_groups)):
            branches.append(
                Conv2d(sc, k, s=self.stride, p=k // 2, g=g, bias=False,
                       dtype=self.dtype, name=f"conv_{i + 1}")(x)
            )
        h, w = branches[0].shape[1:3]
        # shared SE module across all four branches (reference uses one self.se)
        fc1 = Conv2d(max(sc // 16, 1), 1, dtype=self.dtype, name="se_fc1")
        fc2 = Conv2d(sc, 1, dtype=self.dtype, name="se_fc2")
        se = [
            nn.sigmoid(fc2(nn.relu(fc1(bi.mean(axis=(1, 2), keepdims=True)))))
            for bi in branches
        ]
        feats = jnp.stack(branches, axis=1)  # (B, 4, H, W, sc)
        att = jnp.stack(se, axis=1)  # (B, 4, 1, 1, sc)
        att = jax.nn.softmax(att, axis=1)
        out = feats * att
        return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, 4 * sc)


class CPCA(nn.Module):
    """Channel-prior conv attention (reference CPCANet.py:119 CPCA_YOLO over
    :77 RepBlock). The 1×1 `conv` is one shared set of weights applied at the
    global perceptron, the spatial-attention projection and the output —
    matching the reference's (unusual) weight sharing."""

    c1: int
    c2: int = 0
    reduce: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.c2 or self.c1
        if x.shape[-1] != c2:
            x = Conv2d(c2, 1, dtype=self.dtype, name="trans")(x)
        c = c2
        shared = Conv2d(c, 1, dtype=self.dtype, name="conv_shared")
        x = nn.gelu(shared(x))
        # channel attention: avg + max pooled MLPs with shared fc weights
        fc1 = Conv2d(c // self.reduce, 1, dtype=self.dtype, name="ca_fc1")
        fc2 = Conv2d(c, 1, dtype=self.dtype, name="ca_fc2")
        a = nn.sigmoid(fc2(nn.relu(fc1(x.mean(axis=(1, 2), keepdims=True)))))
        m = nn.sigmoid(fc2(nn.relu(fc1(x.max(axis=(1, 2), keepdims=True)))))
        x = (a + m) * x
        x_init = Conv2d(c, 5, p=2, g=c, dtype=self.dtype, name="dconv5_5")(x)
        x1 = Conv2d(c, (1, 7), p=(0, 3), g=c, dtype=self.dtype, name="dconv1_7")(x_init)
        x1 = Conv2d(c, (7, 1), p=(3, 0), g=c, dtype=self.dtype, name="dconv7_1")(x1)
        x2 = Conv2d(c, (1, 11), p=(0, 5), g=c, dtype=self.dtype, name="dconv1_11")(x_init)
        x2 = Conv2d(c, (11, 1), p=(5, 0), g=c, dtype=self.dtype, name="dconv11_1")(x2)
        x3 = Conv2d(c, (1, 21), p=(0, 10), g=c, dtype=self.dtype, name="dconv1_21")(x_init)
        x3 = Conv2d(c, (21, 1), p=(10, 0), g=c, dtype=self.dtype, name="dconv21_1")(x3)
        spatial = shared(x1 + x2 + x3 + x_init)
        return shared(spatial * x)
