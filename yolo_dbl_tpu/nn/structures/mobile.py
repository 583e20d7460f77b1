"""Structures pool, batch 2 (NHWC, flax.linen).

Reference parity (nn/structures/): MQA — MultiQueryAttentionLayerWith
DownSampling (MobileNetv4.py:127, shared single-head k/v with spatial
strides), MFA — MobileNetV5MultiScaleFusionAdapter (MobileNetv5.py:10),
RepGhostModule/RepGhostBottleneck (RepGhost.py:100,216 — add-based ghost
re-param), ReparamLargeKernelConv/RepLKBlock (RepLKNet.py:20,113),
G-Ghost RegNet Bottleneck/Stage (G_Ghost_RegNet.py:85 — cheap-feature
stage with mix merge).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import nearest_upsample
from ..common import Conv2d

Dtype = Any


def _conv_bn(x, c, k, s, g, name, dtype, train, act=None):
    p = k // 2
    y = nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)], feature_group_count=g,
                use_bias=False, dtype=dtype, name=f"{name}_c")(x)
    y = nn.BatchNorm(use_running_average=not train, dtype=dtype, name=f"{name}_bn")(y)
    return act(y) if act else y


class MQA(nn.Module):
    """Multi-query attention with spatial downsampling (reference
    MobileNetv4.py:127): multi-head queries share one key/value head."""

    inp: int
    num_heads: int = 4
    key_dim: int = 64
    value_dim: int = 64
    query_h_strides: int = 1
    query_w_strides: int = 1
    kv_strides: int = 1
    dw_kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh, kd = self.num_heads, self.key_dim
        q_in = x
        if self.query_h_strides > 1 or self.query_w_strides > 1:
            q_in = x[:, :: self.query_h_strides, :: self.query_w_strides]
            q_in = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="q_ds_norm")(q_in)
        q = Conv2d(nh * kd, 1, bias=False, dtype=self.dtype, name="query_proj")(q_in)
        qh, qw = q.shape[1:3]
        q = q.reshape(b, qh * qw, nh, kd)

        kv_in = x
        if self.kv_strides > 1:
            kv_in = _conv_bn(kv_in, c, self.dw_kernel_size, self.kv_strides, c, "kv_dw",
                             self.dtype, train)
        k = Conv2d(kd, 1, bias=False, dtype=self.dtype, name="key_proj")(kv_in).reshape(b, -1, kd)
        v = Conv2d(kd, 1, bias=False, dtype=self.dtype, name="value_proj")(kv_in).reshape(b, -1, kd)

        attn = jax.nn.softmax(jnp.einsum("bnhd,bmd->bhnm", q * kd**-0.5, k), axis=-1)
        out = jnp.einsum("bhnm,bmd->bnhd", attn, v).reshape(b, qh, qw, nh * kd)
        if self.query_h_strides > 1 or self.query_w_strides > 1:
            out = jax.image.resize(out, (b, h, w, nh * kd), "nearest")
        return Conv2d(c, 1, bias=False, dtype=self.dtype, name="output_proj")(out)


class MFA(nn.Module):
    """Multi-scale fusion adapter (reference MobileNetv5.py:10): resize all
    scales to a common resolution, concat, UIB-style FFN, RMS norm."""

    out_chs: int
    output_resolution: int = 16
    expansion_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        b = xs[0].shape[0]
        r = self.output_resolution
        resized = [jax.image.resize(x, (b, r, r, x.shape[-1]), "nearest") for x in xs]
        y = jnp.concatenate(resized, axis=-1)
        cin = y.shape[-1]
        # FFN (UIB with no dw convs = pure pointwise)
        h = int(cin * self.expansion_ratio)
        z = _conv_bn(y, h, 1, 1, 1, "ffn_expand", self.dtype, train, act=nn.relu)
        z = _conv_bn(z, self.out_chs, 1, 1, 1, "ffn_proj", self.dtype, train)
        # RMSNorm2d over channels
        scale = self.param("rms_scale", nn.initializers.ones, (self.out_chs,))
        rms = jnp.sqrt((z**2).mean(axis=-1, keepdims=True) + 1e-6)
        return z / rms * scale.astype(z.dtype)


class RepGhostModule(nn.Module):
    """Add-based ghost module with re-param BN branch (reference RepGhost.py:100)."""

    oup: int
    kernel_size: int = 1
    dw_size: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = _conv_bn(x, self.oup, self.kernel_size, self.stride, 1, "primary", self.dtype, train,
                      act=nn.relu if self.relu else None)
        x2 = _conv_bn(x1, self.oup, self.dw_size, 1, self.oup, "cheap", self.dtype, train)
        # fusion: BN(identity) branch added to the cheap path
        fusion = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="fusion_bn")(x1)
        out = x2 + fusion
        return nn.relu(out) if self.relu else out


class RepGhostBottleneck(nn.Module):
    """RepGhost bottleneck with optional SE (reference RepGhost.py:216)."""

    mid_chs: int
    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        y = RepGhostModule(self.mid_chs, relu=True, dtype=self.dtype, name="ghost1")(x, train)
        if self.stride > 1:
            y = _conv_bn(y, self.mid_chs, self.dw_kernel_size, self.stride, self.mid_chs,
                         "conv_dw", self.dtype, train)
        if self.se_ratio > 0:
            s = y.mean(axis=(1, 2))
            rd = max(1, int(self.mid_chs * self.se_ratio))
            s = nn.relu(nn.Dense(rd, dtype=self.dtype, name="se_fc1")(s))
            s = jnp.clip(nn.Dense(self.mid_chs, dtype=self.dtype, name="se_fc2")(s) + 3, 0, 6) / 6
            y = y * s[:, None, None, :]
        y = RepGhostModule(self.out_chs, relu=False, dtype=self.dtype, name="ghost2")(y, train)
        if in_chs == self.out_chs and self.stride == 1:
            return x + y
        sc = _conv_bn(x, in_chs, self.dw_kernel_size, self.stride, in_chs, "sc_dw", self.dtype, train)
        sc = _conv_bn(sc, self.out_chs, 1, 1, 1, "sc_pw", self.dtype, train)
        return sc + y


class ReparamLargeKernelConv(nn.Module):
    """Large-kernel dw conv + parallel small-kernel branch (RepLKNet.py:20)."""

    out_channels: int
    kernel_size: int = 31
    stride: int = 1
    groups: int = 1
    small_kernel: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv_bn(x, self.out_channels, self.kernel_size, self.stride, self.groups,
                     "lk", self.dtype, train)
        if self.kernel_size > self.small_kernel:
            y = y + _conv_bn(x, self.out_channels, self.small_kernel, self.stride, self.groups,
                             "small", self.dtype, train)
        return y


class RepLKBlock(nn.Module):
    """1×1 → reparam large-kernel dw → 1×1, residual (RepLKNet.py:113)."""

    c2: int
    k: int = 31
    small_kernel: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = _conv_bn(x, self.c2, 1, 1, 1, "pre", self.dtype, train, act=nn.relu)
        y = ReparamLargeKernelConv(self.c2, self.k, 1, self.c2, self.small_kernel,
                                   dtype=self.dtype, name="lkc")(y, train)
        y = nn.relu(y)
        y = _conv_bn(y, self.c2, 1, 1, 1, "post", self.dtype, train)
        return x + y if c1 == self.c2 else y


class GGhostBottleneck(nn.Module):
    """RegNet-style grouped bottleneck (reference G_Ghost_RegNet.py Bottleneck)."""

    planes: int
    stride: int = 1
    group_width: int = 48
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        groups = max(self.planes // self.group_width, 1)
        y = _conv_bn(x, self.planes, 1, 1, 1, "c1", self.dtype, train, act=nn.relu)
        y = _conv_bn(y, self.planes, 3, self.stride, groups, "c2", self.dtype, train, act=nn.relu)
        y = _conv_bn(y, self.planes, 1, 1, 1, "c3", self.dtype, train)
        if self.stride != 1 or c1 != self.planes:
            x = _conv_bn(x, self.planes, 1, self.stride, 1, "down", self.dtype, train)
        return nn.relu(x + y)


class GGhostStage(nn.Module):
    """G-Ghost stage (reference G_Ghost_RegNet.py:85): full-width base/end
    blocks, raw-width intermediate blocks, cheap features synthesized from a
    pooled mix of all intermediates."""

    planes: int
    blocks: int = 3
    stride: int = 1
    group_width: int = 48
    cheap_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gw = int(self.group_width * 0.75)
        raw = max(int(self.planes * (1 - self.cheap_ratio) / gw), 1) * gw
        cheap = self.planes - raw
        y0 = GGhostBottleneck(self.planes, self.stride, self.group_width, dtype=self.dtype, name="base")(x, train)
        feats = [y0]
        y = y0[..., :raw]
        for i in range(max(self.blocks - 2, 0)):
            y = GGhostBottleneck(raw, 1, self.group_width, dtype=self.dtype, name=f"mid{i}")(y, train)
            feats.append(y)
        mix = jnp.concatenate([f.mean(axis=(1, 2)) for f in feats], axis=-1)  # (B, planes+raw*(blocks-2))
        m = nn.relu(nn.Dense(cheap, use_bias=False, dtype=self.dtype, name="merge_fc1")(mix))
        m = nn.Dense(cheap, use_bias=False, dtype=self.dtype, name="merge_fc2")(m)
        cheap_feat = _conv_bn(y0[..., raw:], cheap, 1, 1, 1, "cheap", self.dtype, train)
        cheap_feat = nn.relu(cheap_feat + m[:, None, None, :])
        full = jnp.concatenate([y, cheap_feat], axis=-1)
        return GGhostBottleneck(self.planes, 1, self.group_width, dtype=self.dtype, name="end")(full, train)
