"""PCPE-YOLO C2f_PIG / wavelet-conv family (NHWC, flax.linen).

Reference parity (nn/modules_upsample/PCPE_YOLO_C2f_IG.py): C2f_PIG (:482,
CSP over PConv+InceptionDWConv bottlenecks / GhostBottleneckV2 for deep
stacks), InceptionDWConv2d (:443), partial PConv (:413), WTConv2d (:291 —
wavelet-decomposed depthwise conv) with C2f_WT/Bottleneck_WT (:513,384).
The reference builds db1 (Haar) filters from pywt (absent in this image);
the Haar bank is constructed directly — identical coefficients.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import Conv, Conv2d

Dtype = Any

_H = 1.0 / math.sqrt(2.0)
# db1/Haar decomposition filters (pywt dec_lo/dec_hi reversed).
# Plain numpy, NOT jnp: a module-level jnp.array initializes the JAX backend
# at import time (which hangs the whole process when the TPU tunnel is down).
import numpy as _np

_DEC_LO = _np.array([_H, _H], _np.float32)
_DEC_HI = _np.array([-_H, _H], _np.float32)


def haar_filters():
    """(4, 2, 2) LL/LH/HL/HH analysis bank (reference create_wavelet_filter)."""
    lo, hi = jnp.asarray(_DEC_LO), jnp.asarray(_DEC_HI)
    return jnp.stack([
        lo[None, :] * lo[:, None],
        lo[None, :] * hi[:, None],
        hi[None, :] * lo[:, None],
        hi[None, :] * hi[:, None],
    ])


def wavelet_transform(x):
    """NHWC (B, H, W, C) → (B, H/2, W/2, C, 4) Haar subbands (reference :275)."""
    b, h, w, c = x.shape
    f = haar_filters().astype(x.dtype)  # (4, 2, 2)
    # fold channels into batch → single-channel 4-subband conv
    kernel = f.transpose(1, 2, 0)[:, :, None, :]  # (2, 2, 1, 4) HWIO
    out = jax.lax.conv_general_dilated(
        x.transpose(0, 3, 1, 2).reshape(b * c, h, w, 1),
        kernel, (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B*C, H/2, W/2, 4)
    return out.reshape(b, c, h // 2, w // 2, 4).transpose(0, 2, 3, 1, 4)


def inverse_wavelet_transform(sub):
    """(B, H/2, W/2, C, 4) → (B, H, W, C) Haar reconstruction (reference :283).

    Haar's stride-2 k=2 analysis is non-overlapping, so synthesis is a direct
    per-cell outer product with the (orthonormal) bank — no transpose conv.
    """
    b, h2, w2, c, _ = sub.shape
    f = haar_filters().astype(sub.dtype)  # (4, 2, 2)
    blocks = jnp.einsum("bhwck,kij->bhwcij", sub, f)  # (B, H/2, W/2, C, 2, 2)
    blocks = blocks.transpose(0, 1, 4, 2, 5, 3)  # (B, H/2, 2, W/2, 2, C)
    return blocks.reshape(b, h2 * 2, w2 * 2, c)


class WTConv2d(nn.Module):
    """Wavelet-decomposed depthwise conv (reference :291), 1 level:
    base dw conv + dw conv on the 4 Haar subbands, scale-mixed and
    reconstructed."""

    channels: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        k, p = self.kernel_size, self.kernel_size // 2
        base = Conv2d(c, k, p=p, g=c, dtype=self.dtype, name="base_conv")(x)
        base_scale = self.param("base_scale", nn.initializers.ones, (c,))
        base = base * base_scale.astype(x.dtype)

        # pad to even for the wavelet step
        b, h, w, _ = x.shape
        ph, pw = h % 2, w % 2
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        sub = wavelet_transform(xp)  # (B, H/2, W/2, C, 4)
        hh, ww = sub.shape[1:3]
        flat = sub.reshape(b, hh, ww, c * 4)
        flat = Conv2d(c * 4, k, p=p, g=c * 4, bias=False, dtype=self.dtype, name="wavelet_conv")(flat)
        wscale = self.param("wavelet_scale", nn.initializers.constant(0.1), (c * 4,))
        flat = flat * wscale.astype(x.dtype)
        rec = inverse_wavelet_transform(flat.reshape(b, hh, ww, c, 4))[:, :h, :w]
        return base + rec


class PConvPIG(nn.Module):
    """Partial conv + 1×1 (reference :413 PConv(dim, ouc))."""

    ouc: int
    n_div: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        c3 = c // self.n_div
        x1 = nn.Conv(c3, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                     dtype=self.dtype, name="partial_conv3")(x[..., :c3])
        y = jnp.concatenate([x1, x[..., c3:]], axis=-1)
        return Conv(self.ouc, 1, dtype=self.dtype, name="conv")(y, train)


class InceptionDWConv2d(nn.Module):
    """Inception depthwise conv (reference :443): identity / 3×3 dw /
    1×k band / k×1 band branches + fuse conv."""

    out_channels: int
    square_kernel_size: int = 3
    band_kernel_size: int = 11
    branch_ratio: float = 0.125
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        gc = int(c * self.branch_ratio)
        idc = c - 3 * gc
        x_id = x[..., :idc]
        x_hw = x[..., idc : idc + gc]
        x_w = x[..., idc + gc : idc + 2 * gc]
        x_h = x[..., idc + 2 * gc :]
        k, bk = self.square_kernel_size, self.band_kernel_size
        y_hw = Conv2d(gc, k, p=k // 2, g=gc, dtype=self.dtype, name="dwconv_hw")(x_hw)
        y_w = Conv2d(gc, (1, bk), p=(0, bk // 2), g=gc, dtype=self.dtype, name="dwconv_w")(x_w)
        y_h = Conv2d(gc, (bk, 1), p=(bk // 2, 0), g=gc, dtype=self.dtype, name="dwconv_h")(x_h)
        y = jnp.concatenate([x_id, y_hw, y_w, y_h], axis=-1)
        return Conv(self.out_channels, k, dtype=self.dtype, name="fuse")(y, train)


class C2f_PIG(nn.Module):
    """Parameter-inverted C2f (reference :482): PConv+InceptionDW bottlenecks
    for n≤3, GhostBottleneckV2 stacks beyond."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    se_ratio: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.n <= 3:
                z = PConvPIG(c, dtype=self.dtype, name=f"m_{i}_pconv")(ys[-1], train)
                z = InceptionDWConv2d(c, dtype=self.dtype, name=f"m_{i}_idw")(z, train)
                if self.shortcut:
                    z = ys[-1] + z
            else:
                from ..structures import GhostBottleneckV2

                z = GhostBottleneckV2(c, c, se_ratio=self.se_ratio, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            ys.append(z)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class C2f_WT(nn.Module):
    """C2f over wavelet-conv bottlenecks (reference :513)."""

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
            z = Conv(c, 3, dtype=self.dtype, name=f"m_{i}_cv1")(ys[-1], train)
            z = WTConv2d(c, 3, dtype=self.dtype, name=f"m_{i}_wt")(z, train)
            if self.shortcut:
                z = ys[-1] + z
            ys.append(z)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)
