"""YOLO building blocks (NHWC, flax.linen).

TPU-native re-implementations of the reference's nn/modules/block.py module
family. Each class cites the reference location whose behavior it mirrors;
the internals are idiomatic JAX (token-matmuls for hypergraph message
passing ride the MXU; gathers for DySample use the shared grid_sample op).

All spatial tensors are NHWC; channel concat is axis=-1.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resample import (
    avg_pool2,
    grid_sample_bilinear,
    max_pool,
    nearest_upsample,
    pixel_shuffle,
    pixel_unshuffle,
)
from .common import BN_EPS, BN_MOMENTUM, Conv, Conv2d, DSConv, DWConv

Dtype = Any


class Bottleneck(nn.Module):
    """Standard bottleneck (reference block.py:344): cv1 k[0] → cv2 k[1], optional residual."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference block.py C3)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3").call_parts([a, b], train)


class C2f(nn.Module):
    """Faster CSP bottleneck with 2 convs (reference block.py C2f)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class C3k(nn.Module):
    """C3 with configurable kernel in bottlenecks (reference block.py C3k)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                c_, self.shortcut, self.g, k=(self.k, self.k), e=1.0, dtype=self.dtype, name=f"m_{i}"
            )(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3").call_parts([a, b], train)


class C3k2(nn.Module):
    """C2f variant hosting C3k or Bottleneck blocks (reference block.py C3k2)."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                blk = C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
            else:
                blk = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5, dtype=self.dtype, name=f"m_{i}")
            ys.append(blk(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling — fast (reference block.py SPPF): 3 chained maxpools."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = c1 // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for _ in range(3):
            ys.append(max_pool(ys[-1], self.k, 1, self.k // 2))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class GhostConv(nn.Module):
    """Ghost convolution (reference conv.py GhostConv): primary 1x1/kxk conv
    producing half the channels, cheap 5x5 depthwise producing the rest."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, None, c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference block.py GhostBottleneck): GhostConv →
    optional stride-2 DWConv → linear GhostConv, with conv shortcut at s=2."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="gc1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="gc2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, dtype=self.dtype, name="sc_dw")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x
        return y + sc


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck body (reference block.py C3Ghost)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = GhostBottleneck(c_, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3").call_parts([a, b], train)


class C1(nn.Module):
    """CSP bottleneck with 1 conv (reference block.py C1)."""

    c2: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = Conv(self.c2, 3, dtype=self.dtype, name=f"m_{i}")(z, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (reference block.py C2)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts([a, b], train)


class LightConv(nn.Module):
    """1x1 conv (no act) + depthwise conv (ReLU) — PPHGNetV2 light conv
    (reference conv.py:110)."""

    c2: int
    k: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return DWConv(self.c2, self.k, act=nn.relu, dtype=self.dtype, name="conv2")(x, train)


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 ReLU convs + stride-1 maxpool branch
    (reference block.py:107). The zero right/bottom pad is shared by the
    stem2a conv branch and the ceil-mode pool, exactly as in torch."""

    cm: int
    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = nn.relu
        x = Conv(self.cm, 3, 2, act=r, dtype=self.dtype, name="stem1")(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm // 2, 2, 1, p=0, act=r, dtype=self.dtype, name="stem2a")(x, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm, 2, 1, p=0, act=r, dtype=self.dtype, name="stem2b")(x2, train)
        x1 = max_pool(x, 2, 1, 0)  # zero-padded input -> plain valid pool
        x = jnp.concatenate([x1, x2], axis=-1)
        x = Conv(self.cm, 3, 2, act=r, dtype=self.dtype, name="stem3")(x, train)
        return Conv(self.c2, 1, 1, act=r, dtype=self.dtype, name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 HG block (reference block.py:138): n chained (Light)Convs,
    dense concat, squeeze/excite 1x1 convs, optional residual."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = nn.relu
        y = [x]
        for i in range(self.n):
            if self.lightconv:
                y.append(LightConv(self.cm, self.k, dtype=self.dtype, name=f"m_{i}")(y[-1], train))
            else:
                y.append(Conv(self.cm, self.k, act=r, dtype=self.dtype, name=f"m_{i}")(y[-1], train))
        out = Conv(self.c2 // 2, 1, 1, act=r, dtype=self.dtype, name="sc").call_parts(y, train)
        out = Conv(self.c2, 1, 1, act=r, dtype=self.dtype, name="ec")(out, train)
        return out + x if self.shortcut and x.shape[-1] == self.c2 else out


class RepC3(nn.Module):
    """RT-DETR neck CSP block with RepConv body (reference block.py:286)."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .v9v10 import RepConv

        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y = RepConv(c_, dtype=self.dtype, name=f"m_{i}")(y, train)
        y = y + Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        if c_ != self.c2:
            y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)
        return y


class ResNetBlock(nn.Module):
    """Bottleneck ResNet block, ultralytics flavor (reference block.py:382):
    SiLU convs inside, ReLU on the residual sum."""

    c2: int
    s: int = 1
    e: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.e * self.c2
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, 3, self.s, p=1, dtype=self.dtype, name="cv2")(y, train)
        y = Conv(c3, 1, act=False, dtype=self.dtype, name="cv3")(y, train)
        if self.s != 1 or x.shape[-1] != c3:
            x = Conv(c3, 1, self.s, act=False, dtype=self.dtype, name="shortcut")(x, train)
        return nn.relu(y + x)


class ResNetLayer(nn.Module):
    """Stack of ResNet blocks or the 7x7 stem (reference block.py:399)."""

    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            x = Conv(self.c2, 7, 2, p=3, dtype=self.dtype, name="stem")(x, train)
            return max_pool(x, 3, 2, 1)
        x = ResNetBlock(self.c2, self.s, self.e, dtype=self.dtype, name="b0")(x, train)
        for i in range(1, self.n):
            x = ResNetBlock(self.c2, 1, self.e, dtype=self.dtype, name=f"b{i}")(x, train)
        return x


class SPP(nn.Module):
    """Classic spatial pyramid pooling (reference block.py:162): parallel
    maxpools (5, 9, 13) around a channel-halving 1x1 conv."""

    c2: int
    k: tuple = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y] + [max_pool(y, k, 1, k // 2) for k in self.k]
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class C3_Faster(nn.Module):
    """C3 with FasterNet partial-conv blocks (FFCA-YOLO-L.yaml; the torch
    reference references this module without shipping it — implemented here
    so FFCA-YOLO-L runs)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .structures import FasterBlock

        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = FasterBlock(c_, c_, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3").call_parts([a, b], train)


class CBLinear(nn.Module):
    """YOLOv9e cross-branch linear (reference block.py:684): one conv whose
    output is split into a tuple of per-branch channel groups."""

    c2s: tuple
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .common import autopad, _pad_spec

        p = autopad(self.k, None)
        y = nn.Conv(sum(self.c2s), (self.k, self.k), strides=(self.s, self.s),
                    padding=_pad_spec(p), feature_group_count=self.g,
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        outs, start = [], 0
        for c in self.c2s:
            outs.append(y[..., start:start + c])
            start += c
        return tuple(outs)


def cb_fuse(xs, idx):
    """YOLOv9e cross-branch fuse (reference block.py:698): pick branch
    idx[i] from each CBLinear tuple, nearest-resize to the last input's
    spatial size, and sum everything."""
    target = xs[-1].shape[1:3]
    res = []
    for i, x in enumerate(xs[:-1]):
        t = x[idx[i]]
        b, h, w, c = t.shape
        if (h, w) != tuple(target):
            t = jax.image.resize(t, (b, target[0], target[1], c), "nearest")
        res.append(t)
    return sum(res) + xs[-1]


class SPPCSPC(nn.Module):
    """YOLOv7 CSP spatial pyramid pooling (cfg/models/v7/yolov7.yaml head; the
    torch reference ships the yaml display-only without this module — we
    implement it so v7 actually runs). Two branches: cv1→cv3→cv4 then
    parallel maxpools (5,9,13) → cv5→cv6, shortcut cv2; merged by cv7.
    """

    c2: int
    e: float = 0.5
    k: tuple = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        x1 = Conv(c_, 3, 1, dtype=self.dtype, name="cv3")(x1, train)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv4")(x1, train)
        pools = [x1] + [max_pool(x1, k, 1, k // 2) for k in self.k]
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv5").call_parts(pools, train)
        y1 = Conv(c_, 3, 1, dtype=self.dtype, name="cv6")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv7")(
            jnp.concatenate([y1, y2], -1), train)


class DSBottleneck(nn.Module):
    """Depthwise-separable bottleneck (reference block.py:1408): DSConv k1 → DSConv k2 (dilated)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    k1: int = 3
    k2: int = 5
    d2: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = DSConv(c_, self.k1, 1, d=1, dtype=self.dtype, name="cv1")(x, train)
        y = DSConv(self.c2, self.k2, 1, d=self.d2, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class DSC3k(nn.Module):
    """C3 over DSBottlenecks (reference block.py:1447)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k1: int = 3
    k2: int = 5
    d2: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = DSBottleneck(
                c_, self.shortcut, e=1.0, k1=self.k1, k2=self.k2, d2=self.d2, dtype=self.dtype, name=f"m_{i}"
            )(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3").call_parts([a, b], train)


class DSC3k2(nn.Module):
    """C2f over DSC3k / DSBottleneck blocks (reference block.py:1505)."""

    c2: int
    n: int = 1
    dsc3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    k1: int = 3
    k2: int = 7
    d2: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.dsc3k:
                blk = DSC3k(
                    c, n=2, shortcut=self.shortcut, g=self.g, e=1.0,
                    k1=self.k1, k2=self.k2, d2=self.d2, dtype=self.dtype, name=f"m_{i}",
                )
            else:
                blk = DSBottleneck(
                    c, self.shortcut, e=1.0, k1=self.k1, k2=self.k2, d2=self.d2,
                    dtype=self.dtype, name=f"m_{i}",
                )
            ys.append(blk(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class LSKblock(nn.Module):
    """Large Selective Kernel spatial gating (reference modules_attention/LSKA.py:28).

    5×5 DW conv + 7×7 dilated(3) DW conv branches, channel-squeezed spatial
    gate from avg/max pooling, 2-channel 7×7 gate conv, gated mix, 1×1 out,
    multiplicative residual.
    """

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        attn1 = Conv2d(d, 5, p=2, g=d, dtype=self.dtype, name="conv0")(x)
        attn2 = Conv2d(d, 7, p=9, g=d, d=3, dtype=self.dtype, name="conv_spatial")(attn1)
        attn1 = Conv2d(d // 2, 1, dtype=self.dtype, name="conv1")(attn1)
        attn2 = Conv2d(d // 2, 1, dtype=self.dtype, name="conv2")(attn2)
        attn = jnp.concatenate([attn1, attn2], -1)
        avg_attn = attn.mean(axis=-1, keepdims=True)
        max_attn = attn.max(axis=-1, keepdims=True)
        agg = jnp.concatenate([avg_attn, max_attn], -1)
        sig = nn.sigmoid(Conv2d(2, 7, p=3, dtype=self.dtype, name="conv_squeeze")(agg))
        attn = attn1 * sig[..., 0:1] + attn2 * sig[..., 1:2]
        attn = Conv2d(d, 1, dtype=self.dtype, name="conv")(attn)
        return x * attn


class AdaHyperedgeGen(nn.Module):
    """Adaptive hyperedge participation matrix (reference block.py:1582).

    Context-conditioned prototypes + multi-head similarity; softmax over the
    node axis yields per-hyperedge participation. Pure matmul/softmax — maps
    straight onto the MXU.
    """

    node_dim: int
    num_hyperedges: int
    num_heads: int = 4
    dropout: float = 0.1
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, N, D)
        b, n, d = x.shape
        head_dim = self.node_dim // self.num_heads
        proto_base = self.param(
            "prototype_base",
            nn.initializers.xavier_uniform(),
            (self.num_hyperedges, self.node_dim),
        ).astype(x.dtype)
        if self.context == "mean":
            ctx = x.mean(axis=1)
        elif self.context == "max":
            ctx = x.max(axis=1)
        else:
            ctx = jnp.concatenate([x.mean(axis=1), x.max(axis=1)], -1)
        offsets = nn.Dense(self.num_hyperedges * self.node_dim, dtype=self.dtype, name="context_net")(ctx)
        prototypes = proto_base[None] + offsets.reshape(b, self.num_hyperedges, d)

        xp = nn.Dense(self.node_dim, dtype=self.dtype, name="pre_head_proj")(x)
        xh = xp.reshape(b, n, self.num_heads, head_dim)
        ph = prototypes.reshape(b, self.num_hyperedges, self.num_heads, head_dim)
        # (B, H, N, E)
        logits = jnp.einsum("bnhd,behd->bhne", xh, ph) / math.sqrt(head_dim)
        logits = logits.mean(axis=1)  # (B, N, E)
        logits = nn.Dropout(self.dropout, deterministic=not train)(logits)
        return jax.nn.softmax(logits, axis=1)  # softmax over nodes, as reference


class AdaHGConv(nn.Module):
    """Adaptive hypergraph convolution (reference block.py:1659): vertex→edge→vertex."""

    embed_dim: int
    num_hyperedges: int = 16
    num_heads: int = 4
    dropout: float = 0.1
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = AdaHyperedgeGen(
            self.embed_dim, self.num_hyperedges, self.num_heads, self.dropout, self.context,
            dtype=self.dtype, name="edge_generator",
        )(x, train)
        he = jnp.einsum("bne,bnd->bed", a, x)  # vertex → edge
        # approximate=False: torch nn.GELU() is erf-based; the tanh approx
        # diverges ~1e-3 and breaks weight-port forward parity
        he = nn.gelu(nn.Dense(self.embed_dim, dtype=self.dtype, name="edge_proj")(he), approximate=False)
        xn = jnp.einsum("bne,bed->bnd", a, he)  # edge → vertex
        xn = nn.gelu(nn.Dense(self.embed_dim, dtype=self.dtype, name="node_proj")(xn), approximate=False)
        return xn + x


class AdaHGComputation(nn.Module):
    """NHWC ↔ token wrapper around AdaHGConv (reference block.py:1710)."""

    embed_dim: int
    num_hyperedges: int = 16
    num_heads: int = 8
    dropout: float = 0.1
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = AdaHGConv(
            self.embed_dim, self.num_hyperedges, self.num_heads, self.dropout, self.context,
            dtype=self.dtype, name="hgnn",
        )(tokens, train)
        return tokens.reshape(b, h, w, c)


class C3AH(nn.Module):
    """CSP wrapper over adaptive hypergraph computation (reference block.py:1754)."""

    c2: int
    e: float = 1.0
    num_hyperedges: int = 8
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        assert c_ % 16 == 0, "C3AH hidden dim must be a multiple of 16"
        num_heads = c_ // 16
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        a = AdaHGComputation(
            c_, self.num_hyperedges, num_heads, 0.1, self.context, dtype=self.dtype, name="m"
        )(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3").call_parts([a, b], train)


class FuseModule(nn.Module):
    """3-scale align + fuse for HyperACE (reference block.py:1797).

    Downsamples x[0] (avgpool/2), upsamples x[2] (nearest 2x), concats with
    x[1] and fuses with a 1×1 Conv to c_in channels. channel_adjust selects
    4c→c vs 3c→c fuse conv.
    """

    c_in: int
    channel_adjust: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x1 = avg_pool2(xs[0])
        x3 = nearest_upsample(xs[2], 2)
        return Conv(self.c_in, 1, dtype=self.dtype, name="conv_out").call_parts(
            [x1, xs[1], x3], train)


class HyperACE(nn.Module):
    """Hypergraph Adaptive Correlation Enhancement (reference block.py:1842).

    fuse(3 scales) → cv1 → 3-way split → [y0 | C3AH branch1 | low-order DSC3k
    chain ... | C3AH branch2] → cv2. Multi-input module: takes [P3, P4, P5].
    """

    c1: int
    c2: int
    n: int = 1
    num_hyperedges: int = 8
    dsc3k: bool = True
    shortcut: bool = False
    e1: float = 0.5
    e2: float = 1.0
    context: str = "both"
    channel_adjust: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c = int(self.c2 * self.e1)
        x = FuseModule(self.c1, self.channel_adjust, dtype=self.dtype, name="fuse")(xs, train)
        y = Conv(3 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y0, y1, y2 = y[..., :c], y[..., c : 2 * c], y[..., 2 * c :]
        out1 = C3AH(c, self.e2, self.num_hyperedges, self.context, dtype=self.dtype, name="branch1")(y1, train)
        out2 = C3AH(c, self.e2, self.num_hyperedges, self.context, dtype=self.dtype, name="branch2")(y1, train)
        ys = [y0, out1, y2]
        last = y2
        for i in range(self.n):
            if self.dsc3k:
                blk = DSC3k(c, 2, self.shortcut, k1=3, k2=7, dtype=self.dtype, name=f"m_{i}")
            else:
                blk = DSBottleneck(c, self.shortcut, dtype=self.dtype, name=f"m_{i}")
            last = blk(last, train)
            ys.append(last)
        ys.append(out2)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class FuseModule2(nn.Module):
    """FuseModule variant with 3.5c→c fuse conv (reference block.py:1959)."""

    c_in: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x1 = avg_pool2(xs[0])
        x3 = nearest_upsample(xs[2], 2)
        return Conv(self.c_in, 1, dtype=self.dtype, name="conv_out").call_parts(
            [x1, xs[1], x3], train)


class HyperACE2(nn.Module):
    """HyperACE with FuseModule2 (reference block.py:1967)."""

    c1: int
    c2: int
    n: int = 1
    num_hyperedges: int = 8
    dsc3k: bool = True
    shortcut: bool = False
    e1: float = 0.5
    e2: float = 1.0
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c = int(self.c2 * self.e1)
        x = FuseModule2(self.c1, dtype=self.dtype, name="fuse")(xs, train)
        y = Conv(3 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y0, y1, y2 = y[..., :c], y[..., c : 2 * c], y[..., 2 * c :]
        out1 = C3AH(c, self.e2, self.num_hyperedges, self.context, dtype=self.dtype, name="branch1")(y1, train)
        out2 = C3AH(c, self.e2, self.num_hyperedges, self.context, dtype=self.dtype, name="branch2")(y1, train)
        ys = [y0, out1, y2]
        last = y2
        for i in range(self.n):
            if self.dsc3k:
                blk = DSC3k(c, 2, self.shortcut, k1=3, k2=7, dtype=self.dtype, name=f"m_{i}")
            else:
                blk = DSBottleneck(c, self.shortcut, dtype=self.dtype, name=f"m_{i}")
            last = blk(last, train)
            ys.append(last)
        ys.append(out2)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class DownsampleConv(nn.Module):
    """AvgPool/2 + optional channel-doubling 1×1 (reference block.py:1897)."""

    channel_adjust: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = avg_pool2(x)
        if self.channel_adjust:
            y = Conv(c1 * 2, 1, dtype=self.dtype, name="channel_adjust")(y, train)
        return y


class FullPAD_Tunnel(nn.Module):
    """Gated residual fusion: x[0] + gate * x[1] (reference block.py:1930)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        gate = self.param("gate", nn.initializers.zeros, ())
        return xs[0] + gate.astype(xs[0].dtype) * xs[1]


def _area_attention(q, k, v, head_dim):
    """softmax(q·kᵀ/√d)·v for (B, N, H, hd) tokens.

    On TPU this rides the Pallas flash-attention kernel (no N×N
    materialization — the O(N²) softmax buffer was the HBM hot spot of
    A2C2f at P3/P4 resolutions); tokens are padded to the kernel's 128
    block with segment ids masking the padding. Other backends (CPU tests)
    use the plain einsum path.
    """
    bb, n, nh, hd = q.shape
    import os

    from ..utils.device import committed_platform

    on_tpu = committed_platform() == "tpu"
    # Opt-in: at YOLO head dims (32-64) the einsum path measured FASTER than
    # the flash kernel on v5e (698 vs 425 img/s for yolov13s @ b64 — the
    # kernel's 128-wide blocks waste 4x on hd=32 and force an fp32 cast).
    # Set YOLO_DBL_FLASH_ATTN=1 for long-sequence / large-head configs.
    use_flash = (on_tpu and hd in (32, 64, 128, 256) and n >= 128
                 and os.environ.get("YOLO_DBL_FLASH_ATTN", "0") == "1")
    if use_flash:
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)

            pad = (-n) % 128
            npad = n + pad
            def to_kernel(t):
                t = jnp.swapaxes(t, 1, 2)  # (B, H, N, hd)
                return jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
            qf, kf, vf = (to_kernel(t.astype(jnp.float32)) for t in (q, k, v))
            seg = jnp.concatenate([jnp.zeros((bb, n), jnp.int32),
                                   jnp.ones((bb, pad), jnp.int32)], axis=1)
            bs = BlockSizes(block_q=128, block_k_major=128, block_k=128, block_b=1,
                            block_q_major_dkv=128, block_k_major_dkv=128,
                            block_k_dkv=128, block_q_dkv=128,
                            block_k_major_dq=128, block_k_dq=128, block_q_dq=128)
            out = flash_attention(qf, kf, vf, segment_ids=SegmentIds(seg, seg),
                                  sm_scale=head_dim**-0.5, block_sizes=bs)
            return jnp.swapaxes(out[:, :, :n], 1, 2).astype(q.dtype)  # (B, N, H, hd)
        except Exception:  # pragma: no cover - kernel unavailable on backend
            pass
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim**-0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


class AAttn(nn.Module):
    """Area attention (reference block.py:1187): window-free attention over
    `area` horizontal strips of the token sequence, with conv position encoding."""

    dim: int
    num_heads: int
    area: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        qkv = Conv(self.dim * 3, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, c * 3)
        if self.area > 1:
            qkv = qkv.reshape(b * self.area, n // self.area, c * 3)
        bb, nn_, _ = qkv.shape
        qkv = qkv.reshape(bb, nn_, self.num_heads, head_dim * 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, N, H, hd)
        out = _area_attention(q, k, v, head_dim)
        out = out.reshape(bb, nn_, c)
        v = v.reshape(bb, nn_, c)
        if self.area > 1:
            out = out.reshape(b, n, c)
            v = v.reshape(b, n, c)
        out = out.reshape(b, h, w, c)
        v = v.reshape(b, h, w, c)
        pe = Conv(self.dim, 7, 1, p=3, g=self.dim, act=False, dtype=self.dtype, name="pe")(v, train)
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(out + pe, train)


class ABlock(nn.Module):
    """Area-attention block: attention + MLP, both residual (reference block.py:1271)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, dtype=self.dtype, name="attn")(x, train)
        h = int(self.dim * self.mlp_ratio)
        y = Conv(h, 1, dtype=self.dtype, name="mlp_0")(x, train)
        y = Conv(self.dim, 1, act=False, dtype=self.dtype, name="mlp_1")(y, train)
        return x + y


class A2C2f(nn.Module):
    """Area-attention C2f (reference block.py:1327)."""

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        assert c_ % 32 == 0, "A2C2f hidden dim must be a multiple of 32"
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for i in range(self.n):
            if self.a2:
                z = ys[-1]
                for j in range(2):
                    z = ABlock(
                        c_, c_ // 32, self.mlp_ratio, self.area, dtype=self.dtype, name=f"m_{i}_{j}"
                    )(z, train)
                ys.append(z)
            else:
                ys.append(C3k(c_, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)
        if self.a2 and self.residual:
            gamma = self.param("gamma", nn.initializers.constant(0.01), (self.c2,))
            return x + gamma.astype(out.dtype) * out
        return out


class DySample(nn.Module):
    """Dynamic point-sampling upsampler (reference modules_upsample/DySample.py:20).

    'lp' style: a 1×1 conv predicts per-group sample offsets (scaled 0.25, or
    sigmoid-gated when dyscope), added to a static sub-pixel init grid;
    offsets are pixel-shuffled to output resolution and used to gather the
    input via bilinear grid sampling (border padding, align_corners=False).
    """

    in_channels: int
    scale: int = 2
    style: str = "lp"
    groups: int = 4
    dyscope: bool = False
    dtype: Dtype = jnp.float32

    def _init_pos(self):
        s, g = self.scale, self.groups
        h = (jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2) / s
        gy, gx = jnp.meshgrid(h, h, indexing="ij")
        # matches torch stack(meshgrid([h,h],ij)).transpose(1,2):
        # channel-0 (x-offset) varies along the fast (dx) axis, channel-1 (y)
        # along the slow (dy) axis, so sub-pixels land on the s×s lattice.
        grid = jnp.stack([gx, gy])  # (2, s, s)
        return jnp.tile(grid.reshape(2, -1), (1, self.groups)).reshape(-1)  # (2*g*s*s,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.style == "lp", "only 'lp' style is used by the reference configs"
        b, h, w, c = x.shape
        g, s = self.groups, self.scale
        out_ch = 2 * g * s * s
        off = Conv2d(out_ch, 1, dtype=self.dtype, name="offset")(x)  # (B,H,W,2*g*s2)
        if self.dyscope:
            scope = Conv2d(out_ch, 1, bias=False, dtype=self.dtype, name="scope")(x)
            off = off * nn.sigmoid(scope) * 0.5
        else:
            off = off * 0.25
        init_pos = self._init_pos().astype(off.dtype)  # (2*g*s2,) ordered [x..., y...]
        off = off + init_pos[None, None, None, :]

        # offsets → (B, 2, g*s2, H, W) like the reference's view(B, 2, -1, H, W)
        off = jnp.transpose(off, (0, 3, 1, 2)).reshape(b, 2, g * s * s, h, w)
        coords_w = jnp.arange(w, dtype=off.dtype) + 0.5
        coords_h = jnp.arange(h, dtype=off.dtype) + 0.5
        gy, gx = jnp.meshgrid(coords_h, coords_w, indexing="ij")
        base = jnp.stack([gx, gy])[:, None]  # (2, 1, H, W)
        coords = 2.0 * (base[None] + off) / jnp.array([w, h], dtype=off.dtype).reshape(1, 2, 1, 1, 1) - 1.0

        # pixel-shuffle coords to (B, sH, sW, 2, g) — group stays a MINOR dim
        coords = coords.reshape(b, 2 * g * s * s, h, w)
        coords = jnp.transpose(coords, (0, 2, 3, 1))  # NHWC
        coords = pixel_shuffle(coords, s)  # (B, sH, sW, 2*g)
        coords = coords.reshape(b, s * h, s * w, 2, g)

        # Sampling path under train: one-hot matmul, same as eval. Safe since
        # the one-hot chunk body is jax.checkpoint'ed (ops/resample.py) — its
        # interpolation matrix is REBUILT in the backward, not retained (the
        # round-2 OOM was the un-checkpointed form), and its backward is
        # itself matmuls on the MXU: measured 3x faster than the gather
        # path's scatter-add backward (19.7 -> 6.2 ms for 40->80 at b16,
        # tools/exp_train_breakdown.py). YOLO_DBL_TRAIN_GATHER=1 forces the
        # gather path back for A/B. Eval: backend auto (one-hot on TPU only).
        import os as _os

        train_pref = False if _os.environ.get("YOLO_DBL_TRAIN_GATHER") else None
        # Per-group sampling on minor-dim channel slices. The old form folded
        # the group into the batch (transpose to (B*g, H, W, c/g) and back),
        # which materialized two full feature-map relayouts per DySample —
        # the 839 MB copies at the top of the round-5 b128 traffic map.
        # Channel groups are CONTIGUOUS (reference DySample.py:49 view), so
        # slicing x[..., gi*cg:(gi+1)*cg] and concatenating the sampled
        # groups back on the minor axis is pure reshape traffic XLA folds
        # into the producers; per-group math is unchanged (same weights,
        # same contraction order — bitwise-identical results).
        cg = c // g
        out = jnp.concatenate(
            [
                grid_sample_bilinear(
                    x[..., gi * cg : (gi + 1) * cg],
                    coords[..., gi],
                    prefer_onehot=train_pref if train else None,
                    # inference unrolls the one-hot chunk loop (kills the
                    # lax.map boundary relayouts, 1.025x e2e); training
                    # keeps lax.map to bound the backward live set
                    prefer_unroll=not train,
                )
                for gi in range(g)
            ],
            axis=-1,
        )  # (B, sH, sW, c)
        return out
