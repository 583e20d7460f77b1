"""YOLOv7/v9/v10/v11 module family (NHWC, flax.linen).

Reference parity (nn/modules/block.py): RepConv (conv.py RepConv —
training-form 3×3 + 1×1 branches), RepBottleneck (:572), RepCSP (:582),
RepNCSPELAN4 (:592), ELAN1 (:617), AConv (:630), ADown (:644), SPPELAN
(:664), CIB (:818), C2fCIB (:857), v10/v11 Attention (:877), PSABlock
(:933), PSA (:970), C2PSA (:1013), SCDown (:1088). Enables the v9/v10/v11
model yamls through the same compiler.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resample import max_pool
from .blocks import C3, Bottleneck
from .common import Conv, Conv2d

Dtype = Any


class RepConv(nn.Module):
    """RepVGG-style conv (reference conv.py RepConv, train form): 3×3-BN +
    1×1-BN (+identity BN if bn=True), SiLU. XLA folds the branch sum at
    inference where torch fuse_convs() re-parameterizes by hand."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    bn: bool = False
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]

        # names follow the torch attrs (conv1 = dense 3x3, conv2 = 1x1,
        # bn = identity) so checkpoints port (utils/port.py flat-collapse)
        def branch(k, p, name):
            y = nn.Conv(self.c2, (k, k), strides=(self.s, self.s), padding=[(p, p), (p, p)],
                        feature_group_count=self.g, use_bias=False, dtype=self.dtype, name=f"{name}_conv")(x)
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"{name}_bn")(y)

        y = branch(self.k, self.k // 2, "conv1") + branch(1, 0, "conv2")
        if self.bn and c1 == self.c2 and self.s == 1:
            y = y + nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(x)
        return nn.silu(y) if self.act else y


class RepCSP(nn.Module):
    """C3 over RepBottlenecks (reference block.py:582)."""

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
            # RepBottleneck: cv1 is a RepConv (block.py:572)
            y = RepConv(c_, 3, dtype=self.dtype, name=f"m_{i}_cv1")(a, train)
            y = Conv(c_, 3, 1, g=self.g, dtype=self.dtype, name=f"m_{i}_cv2")(y, train)
            a = a + y if self.shortcut else y
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3").call_parts([a, b], train)


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN (reference block.py:592)."""

    c2: int
    c3: int
    c4: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        c = self.c3 // 2
        ys = [y[..., :c], y[..., c:]]
        # torch cv2/cv3 are Sequential(RepCSP, Conv) → merged names _0/_1
        z = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv2_0")(ys[-1], train)
        z = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2_1")(z, train)
        ys.append(z)
        z = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv3_0")(z, train)
        z = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3_1")(z, train)
        ys.append(z)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4").call_parts(ys, train)


class ELAN1(nn.Module):
    """ELAN with plain convs (reference block.py:617)."""

    c2: int
    c3: int
    c4: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        c = self.c3 // 2
        ys = [y[..., :c], y[..., c:]]
        z = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2")(ys[-1], train)
        ys.append(z)
        z = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3")(z, train)
        ys.append(z)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4").call_parts(ys, train)


def _avg_pool2_s1(x):
    """torch F.avg_pool2d(x, 2, 1, 0, False, True): 2×2 stride-1 mean."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), ((0, 0), (0, 1), (0, 1), (0, 0))
    ) / jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), ((0, 0), (0, 1), (0, 1), (0, 0))
    )


class AConv(nn.Module):
    """avgpool(2,1) + strided conv (reference block.py:630)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return Conv(self.c2, 3, 2, 1, dtype=self.dtype, name="cv1")(_avg_pool2_s1(x), train)


class ADown(nn.Module):
    """Split downsample: conv-stride branch + maxpool branch (reference block.py:644)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        y = _avg_pool2_s1(x)
        c1h = y.shape[-1] // 2
        x1, x2 = y[..., :c1h], y[..., c1h:]
        x1 = Conv(c, 3, 2, 1, dtype=self.dtype, name="cv1")(x1, train)
        x2 = max_pool(x2, 3, 2, 1)
        x2 = Conv(c, 1, 1, 0, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], -1)


class SPPELAN(nn.Module):
    """SPP-ELAN (reference block.py:664)."""

    c2: int
    c3: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for _ in range(3):
            ys.append(max_pool(ys[-1], self.k, 1, self.k // 2))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv5").call_parts(ys, train)


class RepVGGDWBlock(nn.Module):
    """Depthwise RepVGG for CIB lk=True (reference block.py RepVGGDW)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        a = Conv(c, 7, 1, 3, g=c, act=False, dtype=self.dtype, name="conv")(x, train)
        b = Conv(c, 3, 1, 1, g=c, act=False, dtype=self.dtype, name="conv1")(x, train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Conditional identity block (reference block.py:818)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c1, 3, g=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = Conv(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDWBlock(dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = Conv(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = Conv(self.c2, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = Conv(self.c2, 3, g=self.c2, dtype=self.dtype, name="cv1_4")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(nn.Module):
    """C2f over CIBs (reference block.py:857)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(CIB(c, self.shortcut, e=1.0, lk=self.lk, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class V10Attention(nn.Module):
    """v10/v11 PSA attention (reference block.py:877)."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        kd = int(hd * self.attn_ratio)
        scale = kd**-0.5
        qkv = Conv(c + 2 * kd * nh, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, h * w, nh, 2 * kd + hd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        attn = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q * scale, k), axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, c)
        pe = Conv(c, 3, 1, g=c, act=False, dtype=self.dtype, name="pe")(v.reshape(b, h, w, c), train)
        return Conv(c, 1, act=False, dtype=self.dtype, name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """Attention + FFN with residuals (reference block.py:933)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = V10Attention(self.c, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = Conv(self.c * 2, 1, dtype=self.dtype, name="ffn_0")(x, train)
        f = Conv(self.c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        return x + f if self.shortcut else f


class PSA(nn.Module):
    """Position-sensitive attention block (reference block.py:970)."""

    c2: int
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(x.shape[-1] * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = b + V10Attention(c, max(c // 64, 1), 0.5, dtype=self.dtype, name="attn")(b, train)
        f = Conv(c * 2, 1, dtype=self.dtype, name="ffn_0")(b, train)
        f = Conv(c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        b = b + f
        return Conv(x.shape[-1], 1, dtype=self.dtype, name="cv2").call_parts([a, b], train)


class C2PSA(nn.Module):
    """Stacked PSABlocks in a CSP wrapper (reference block.py:1013)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, 0.5, max(c // 64, 1), dtype=self.dtype, name=f"m_{i}")(b, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts([a, b], train)


class SCDown(nn.Module):
    """Separable-conv downsample (reference block.py:1088)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        return Conv(self.c2, self.k, self.s, g=self.c2, act=False, dtype=self.dtype, name="cv2")(y, train)
