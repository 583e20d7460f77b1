"""Channel/spatial gating attention pool, batch 1 (NHWC, flax.linen).

TPU-native re-implementations of the reference's simplest attention modules
(nn/modules_attention/): SELayer (SE.py:6), ECALayer (ECA.py:53), CBAM
family (nn/modules/conv.py:304-346), SimAM (SimAM.py:4), EMA (EMA.py:4),
CoordAttention (CoordAttention.py:60), GAM (GAM.py:13), TripletAttention
(TripletAttention.py:72), MLCA (MLCA.py:6), ELA (YOLO_ELA.py:30), BAM
(BAM.py:42), CoTNetLayer (CoTNetBlock.py:11). All are elementwise/pool/conv
compositions that XLA fuses; no kernels needed.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import Conv2d
from .pooling import adaptive_avg_pool2d, adaptive_avg_pool_h, adaptive_avg_pool_w

Dtype = Any


def _conv1d_channels(y, k, name_module, features_per_step=1):
    """1-D conv over the channel axis of a (B, C) tensor (ECA style)."""
    # reshape channels into a spatial axis: (B, C, 1)
    return y


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference SE.py:6)."""

    channel: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        y = x.mean(axis=(1, 2))  # (B, C)
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class ECALayer(nn.Module):
    """Efficient channel attention: 1-D conv across channels (reference ECA.py:53)."""

    channel: int = 0
    k_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.mean(axis=(1, 2))[..., None]  # (B, C, 1): channels as length
        y = nn.Conv(1, kernel_size=(self.k_size,), padding=[( (self.k_size - 1) // 2,) * 2],
                    use_bias=False, dtype=self.dtype, name="conv")(y)
        y = nn.sigmoid(y[..., 0])
        return x * y[:, None, None, :]


class ChannelAttention(nn.Module):
    """CBAM channel branch (reference conv.py:304)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = Conv2d(self.channels, 1, dtype=self.dtype, name="fc")(y)
        return x * nn.sigmoid(y)


class SpatialAttention(nn.Module):
    """CBAM spatial branch (reference conv.py:319)."""

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.concatenate(
            [x.mean(axis=-1, keepdims=True), x.max(axis=-1, keepdims=True)], axis=-1
        )
        p = 3 if self.kernel_size == 7 else 1
        y = Conv2d(1, self.kernel_size, p=p, bias=False, dtype=self.dtype, name="cv1")(pooled)
        return x * nn.sigmoid(y)


class CBAM(nn.Module):
    """Convolutional block attention (reference conv.py:335)."""

    c1: int
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(self.c1, dtype=self.dtype, name="channel_attention")(x, train)
        return SpatialAttention(self.kernel_size, dtype=self.dtype, name="spatial_attention")(x, train)


class SimAM(nn.Module):
    """Parameter-free energy attention (reference SimAM.py:4)."""

    channels: int = 0
    e_lambda: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w - 1
        mu = x.mean(axis=(1, 2), keepdims=True)
        sq = (x - mu) ** 2
        y = sq / (4 * (sq.sum(axis=(1, 2), keepdims=True) / n + self.e_lambda)) + 0.5
        return x * nn.sigmoid(y)


class EMA(nn.Module):
    """Efficient multi-scale attention (reference EMA.py:4): grouped h/w strip
    pooling + GroupNorm gate + cross 1x1/3x3 softmax-weighted fusion."""

    channels: int
    factor: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.factor
        cg = c // g
        gx = x.reshape(b, h, w, g, cg)
        gx = jnp.transpose(gx, (0, 3, 1, 2, 4)).reshape(b * g, h, w, cg)
        x_h = adaptive_avg_pool_h(gx)  # (BG, H, 1, cg)
        x_w = adaptive_avg_pool_w(gx)  # (BG, 1, W, cg)
        x_w_t = jnp.transpose(x_w, (0, 2, 1, 3))  # (BG, W, 1, cg)
        hw = Conv2d(cg, 1, dtype=self.dtype, name="conv1x1")(
            jnp.concatenate([x_h, x_w_t], axis=1)
        )  # (BG, H+W, 1, cg)
        xh, xw = hw[:, :h], hw[:, h:]
        xw = jnp.transpose(xw, (0, 2, 1, 3))  # (BG, 1, W, cg)
        gated = gx * nn.sigmoid(xh) * nn.sigmoid(xw)
        x1 = nn.GroupNorm(num_groups=cg, dtype=self.dtype, name="gn")(gated)
        x2 = Conv2d(cg, 3, p=1, dtype=self.dtype, name="conv3x3")(gx)
        x11 = jax.nn.softmax(x1.mean(axis=(1, 2)), axis=-1)[:, None, :]  # (BG, 1, cg)
        x12 = x2.reshape(b * g, h * w, cg)
        x21 = jax.nn.softmax(x2.mean(axis=(1, 2)), axis=-1)[:, None, :]
        x22 = x1.reshape(b * g, h * w, cg)
        weights = (
            jnp.einsum("boc,bnc->bon", x11, x12) + jnp.einsum("boc,bnc->bon", x21, x22)
        ).reshape(b * g, h, w, 1)
        out = gx * nn.sigmoid(weights)
        out = out.reshape(b, g, h, w, cg)
        return jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, h, w, c)


def h_swish(x):
    return x * nn.relu6(x + 3) / 6


class CoordAttention(nn.Module):
    """Coordinate attention (reference CoordAttention.py:60)."""

    in_channels: int
    out_channels: int = 0
    reduction: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        oup = self.out_channels or c
        temp_c = max(8, c // self.reduction)
        x_h = adaptive_avg_pool_h(x)  # (B, H, 1, C)
        x_w = jnp.transpose(adaptive_avg_pool_w(x), (0, 2, 1, 3))  # (B, W, 1, C)
        y = jnp.concatenate([x_h, x_w], axis=1)
        y = Conv2d(temp_c, 1, dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = h_swish(y)
        yh, yw = y[:, :h], y[:, h:]
        yw = jnp.transpose(yw, (0, 2, 1, 3))
        a_h = nn.sigmoid(Conv2d(oup, 1, dtype=self.dtype, name="conv2")(yh))
        a_w = nn.sigmoid(Conv2d(oup, 1, dtype=self.dtype, name="conv3")(yw))
        return x * a_w * a_h


class GAM(nn.Module):
    """Global attention mechanism (reference GAM.py:13)."""

    c1: int
    c2: int = 0
    group: bool = True
    rate: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        c2 = self.c2 or c
        y = nn.Dense(c // self.rate, dtype=self.dtype, name="ca_fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype, name="ca_fc2")(y)
        x = x * y
        g = self.rate if self.group else 1
        s = Conv2d(c // self.rate, 7, p=3, g=g, dtype=self.dtype, name="sa_conv1")(x)
        s = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="sa_bn1")(s)
        s = nn.relu(s)
        s = Conv2d(c2, 7, p=3, g=g, dtype=self.dtype, name="sa_conv2")(s)
        s = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="sa_bn2")(s)
        s = nn.sigmoid(s)
        # channel shuffle, groups=4 (reference GAM.py:44)
        s = s.reshape(b, h, w, 4, c2 // 4)
        s = jnp.transpose(s, (0, 1, 2, 4, 3)).reshape(b, h, w, c2)
        return x * s


class _TripletGate(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.concatenate(
            [x.max(axis=-1, keepdims=True), x.mean(axis=-1, keepdims=True)], axis=-1
        )
        y = Conv2d(1, 7, p=3, bias=False, dtype=self.dtype, name="spatial")(pooled)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(y)
        return x * nn.sigmoid(y)


class TripletAttention(nn.Module):
    """3-branch rotate-and-gate attention (reference TripletAttention.py:72).
    Channel axis is rotated into a spatial position per branch."""

    in_channel: int = 0
    spatial: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # branch 1: swap C↔H (torch permute(0,2,1,3) in NCHW ≡ NHWC swap axes 1<->3 ... )
        xp1 = jnp.transpose(x, (0, 3, 2, 1))  # gate over (W, ?) with "channels" = H
        o1 = _TripletGate(dtype=self.dtype, name="gate_h")(xp1, train)
        o1 = jnp.transpose(o1, (0, 3, 2, 1))
        xp2 = jnp.transpose(x, (0, 1, 3, 2))  # swap C↔W
        o2 = _TripletGate(dtype=self.dtype, name="gate_w")(xp2, train)
        o2 = jnp.transpose(o2, (0, 1, 3, 2))
        if self.spatial:
            o3 = _TripletGate(dtype=self.dtype, name="gate_s")(x, train)
            return (o1 + o2 + o3) / 3
        return (o1 + o2) / 2


class MLCA(nn.Module):
    """Mixed local-channel attention (reference MLCA.py:6)."""

    in_size: int
    local_size: int = 5
    gamma: int = 2
    b: int = 1
    local_weight: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bsz, h, w, c = x.shape
        t = int(abs(math.log(self.in_size, 2) + self.b) / self.gamma)
        k = t if t % 2 else t + 1
        ls = self.local_size
        local = adaptive_avg_pool2d(x, (ls, ls))  # (B, ls, ls, C)
        global_ = local.mean(axis=(1, 2))  # (B, C)

        # global ECA conv across channels
        yg = nn.Conv(1, (k,), padding=[((k - 1) // 2,) * 2], use_bias=False,
                     dtype=self.dtype, name="conv")(global_[..., None])[..., 0]
        # local conv across the flattened (ls*ls*C) sequence
        tl = local.reshape(bsz, ls * ls * c)  # NHWC flatten == torch's (spatial, C) flatten
        yl = nn.Conv(1, (k,), padding=[((k - 1) // 2,) * 2], use_bias=False,
                     dtype=self.dtype, name="conv_local")(tl[..., None])[..., 0]
        att_local = nn.sigmoid(yl.reshape(bsz, ls, ls, c))
        att_global = jnp.broadcast_to(nn.sigmoid(yg)[:, None, None, :], (bsz, ls, ls, c))
        att = att_global * (1 - self.local_weight) + att_local * self.local_weight
        att = adaptive_avg_pool2d(att, (h, w))  # un-pool to input resolution
        return x * att


class ELA(nn.Module):
    """Efficient local attention: strip pooling + grouped 1-D conv + GN
    (reference YOLO_ELA.py:30). The same conv/GN weights process H and W strips."""

    channel: int
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        conv = nn.Conv(c, (self.kernel_size,), padding=[(self.kernel_size // 2,) * 2],
                       feature_group_count=c, use_bias=False, dtype=self.dtype, name="conv")
        gn = nn.GroupNorm(num_groups=16, dtype=self.dtype, name="gn")
        x_h = x.mean(axis=2)  # (B, H, C)
        x_w = x.mean(axis=1)  # (B, W, C)
        x_h = nn.sigmoid(gn(conv(x_h)))[:, :, None, :]  # (B, H, 1, C)
        x_w = nn.sigmoid(gn(conv(x_w)))[:, None, :, :]  # (B, 1, W, C)
        return x * x_h * x_w


class BAM(nn.Module):
    """Bottleneck attention (reference BAM.py:42): 1 + sigmoid(channel*spatial).

    The reference's BAM_YOLO skips batch-1 inputs to dodge torch BatchNorm1d;
    our BN has no such constraint so the gate always applies.
    """

    c1: int
    reduction: int = 16
    dilation_val: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # channel gate
        y = x.mean(axis=(1, 2))
        y = nn.Dense(c // self.reduction, dtype=self.dtype, name="gate_c_fc0")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="gate_c_bn1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype, name="gate_c_fc_final")(y)
        ch_att = y[:, None, None, :]
        # spatial gate
        s = Conv2d(c // self.reduction, 1, dtype=self.dtype, name="gate_s_reduce")(x)
        s = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="gate_s_bn_r")(s)
        s = nn.relu(s)
        for i in range(2):
            s = Conv2d(c // self.reduction, 3, p=self.dilation_val, d=self.dilation_val,
                       dtype=self.dtype, name=f"gate_s_di{i}")(s)
            s = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"gate_s_bn{i}")(s)
            s = nn.relu(s)
        s = Conv2d(1, 1, dtype=self.dtype, name="gate_s_final")(s)
        att = 1 + nn.sigmoid(ch_att * s)
        return att * x


class CoTNetLayer(nn.Module):
    """Contextual transformer block (reference CoTNetBlock.py:11)."""

    dim: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k1 = Conv2d(c, self.kernel_size, p=1, bias=False, dtype=self.dtype, name="key_conv")(x)
        k1 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="key_bn")(k1)
        k1 = nn.relu(k1)
        v = Conv2d(c, 1, bias=False, dtype=self.dtype, name="value_conv")(x)
        v = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="value_bn")(v)
        y = jnp.concatenate([k1, x], axis=-1)
        factor = 4
        att = Conv2d(2 * c // factor, 1, bias=False, dtype=self.dtype, name="att_conv1")(y)
        att = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="att_bn")(att)
        att = nn.relu(att)
        att = Conv2d(self.kernel_size * self.kernel_size * c, 1, dtype=self.dtype, name="att_conv2")(att)
        att = att.reshape(b, h, w, c, self.kernel_size * self.kernel_size).mean(-1)
        att = att.reshape(b, h * w, c)
        k2 = jax.nn.softmax(att, axis=1) * v.reshape(b, h * w, c)  # softmax over positions
        return k1 + k2.reshape(b, h, w, c)


class ECALayer_ns(nn.Module):
    """ECA 'no squeeze' (reference ECA.py:53): each channel's gate is a
    learned k-tap combination of its OWN pooled neighborhood (grouped conv1d
    with groups=channel, i.e. per-channel weights, not the shared k-tap of
    plain ECA)."""

    channel: int
    k_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        y = x.mean(axis=(1, 2))  # (B, C)
        p = (self.k_size - 1) // 2
        yp = jnp.pad(y, ((0, 0), (p, p)))
        # (B, C, k) pooled neighborhood of each channel (torch unfold)
        nb = jnp.stack([yp[:, i:i + c] for i in range(self.k_size)], axis=-1)
        wgt = self.param("conv", nn.initializers.lecun_normal(),
                         (c, self.k_size)).astype(x.dtype)
        g = jax.nn.sigmoid((nb * wgt[None]).sum(-1))  # (B, C)
        return x * g[:, None, None, :]
