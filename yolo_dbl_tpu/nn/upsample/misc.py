"""Upsample/fusion/enhancement pool (NHWC, flax.linen).

Reference parity (nn/modules_upsample/): EUCB (EMCAD_decoders.py:209), MEUM
(MEUM.py:42), SPDConv + EFE/C3k2_EFE + Multibranch (IRSTD_YOLO.py:60,30,149),
FEM / SCAM / FFM_Concat2 / FFM_Concat3 (FFCA_YOLO.py:138,43,85,111), CAA
(PCPE_YOLO_CAA.py:6).

Deliberate divergences from reference quirks (documented, intended-behavior
implementations):
  * EFE's SobelConv mis-shapes its Conv3d weights so its edge branch emits
    zeros in torch (IRSTD_YOLO.py:14-28); here a real 2-D depthwise Sobel.
  * FFM_Concat's per-channel fusion weights are applied through an NCHW
    `.view(N,H,W,C)` reinterpretation in torch (FFCA_YOLO.py:106), scrambling
    the axis; here they weight actual channels as intended.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import avg_pool2, bilinear_upsample, nearest_upsample
from ..common import Conv, Conv2d

Dtype = Any


class EUCB(nn.Module):
    """Efficient up-conv block (reference EMCAD_decoders.py:209): nearest 2x →
    depthwise conv+BN+ReLU → channel shuffle(groups=C → full transpose) → 1×1."""

    in_channels: int
    out_channels: int = 0
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        oc = self.out_channels or c
        y = nearest_upsample(x, 2)
        y = Conv2d(c, self.kernel_size, s=self.stride, p=self.kernel_size // 2, g=c,
                   bias=False, dtype=self.dtype, name="up_dwc")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(y)
        y = nn.relu(y)
        # channel_shuffle with groups == C is identity on a C-channel tensor
        return Conv2d(oc, 1, dtype=self.dtype, name="pwc")(y)


class MEUM(nn.Module):
    """Multi-scale edge-aware upsampling (reference MEUM.py:42): bilinear 2x
    (align_corners=True) + sigmoid-1×1 transform + edge enhancer residual."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xu = bilinear_upsample(x, 2, align_corners=True)
        t = nn.sigmoid(Conv2d(self.channels, 1, bias=False, dtype=self.dtype, name="meem_conv")(xu))
        # EdgeEnhancer (MEUM.py:16): x - avgpool3x3(x) → 1×1 → sigmoid
        pooled = jax.lax.reduce_window(
            t, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
        ) / 9.0
        edge = t - pooled
        edge = nn.sigmoid(Conv2d(self.channels, 1, bias=False, dtype=self.dtype, name="ee_conv")(edge))
        return xu + edge


class SPDConv(nn.Module):
    """Space-to-depth conv (reference IRSTD_YOLO.py:60): 2×2 pixel-unshuffle
    concat then 3×3 Conv."""

    inc: int
    ouc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        parts = [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]]
        y = jnp.concatenate(parts, axis=-1)
        return Conv(self.ouc, 3, dtype=self.dtype, name="conv")(y, train)


class EFE(nn.Module):
    """Edge-feature enhancement (reference IRSTD_YOLO.py:30): Sobel branch +
    conv branch → fuse → residual → 1×1. Real 2-D Sobel (see module docstring)."""

    inc: int
    ouc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        sob = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)

        def sobel(k):
            kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
            return jax.lax.conv_general_dilated(
                x, kernel, (1, 1), [(1, 1), (1, 1)], feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        x_sobel = sobel(sob) + sobel(sob.T)
        x_conv = Conv(c, 3, dtype=self.dtype, name="conv_branch")(x, train)
        y = Conv(c, 1, dtype=self.dtype, name="conv1").call_parts([x_sobel, x_conv], train)
        return Conv(self.ouc, 1, dtype=self.dtype, name="conv2")(y + x, train)


class C3k2_EFE(nn.Module):
    """C3k2 with EFE inner blocks (reference IRSTD_YOLO.py:53)."""

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
                # C3k_EFE: C3 wrapper over 2 EFE blocks
                a = Conv(c // 2, 1, dtype=self.dtype, name=f"m_{i}_cv1")(ys[-1], train)
                bb = Conv(c // 2, 1, dtype=self.dtype, name=f"m_{i}_cv2")(ys[-1], train)
                for j in range(2):
                    a = EFE(c // 2, c // 2, dtype=self.dtype, name=f"m_{i}_efe{j}")(a, train)
                ys.append(Conv(c, 1, dtype=self.dtype, name=f"m_{i}_cv3").call_parts([a, bb], train))
            else:
                ys.append(EFE(c, c, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class FGM(nn.Module):
    """Fourier gating (reference IRSTD_YOLO.py:74): x1 * FFT(x2) → |IFFT|."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x1 = Conv2d(c, 1, dtype=self.dtype, name="dwconv1")(x)
        x2 = Conv2d(c, 1, dtype=self.dtype, name="dwconv2")(x)
        x2f = jnp.fft.fft2(x2.astype(jnp.complex64), axes=(1, 2))
        out = jnp.abs(jnp.fft.ifft2(x1.astype(jnp.complex64) * x2f, axes=(1, 2))).astype(x.dtype)
        alpha = self.param("alpha", nn.initializers.zeros, (c,))
        beta = self.param("beta", nn.initializers.ones, (c,))
        return out * alpha.astype(x.dtype) + x * beta.astype(x.dtype)


class OmniKernel(nn.Module):
    """Omni-kernel block (reference IRSTD_YOLO.py:101): 31-tap strip/square
    depthwise convs + frequency-domain channel attention + FGM."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ker, pad = 31, 15
        out = nn.gelu(Conv2d(c, 1, dtype=self.dtype, name="in_conv")(x))
        # fca
        x_att = Conv2d(c, 1, dtype=self.dtype, name="fac_conv")(out.mean(axis=(1, 2), keepdims=True))
        x_fft = jnp.fft.fft2(out.astype(jnp.complex64), axes=(1, 2))
        x_fca = jnp.abs(jnp.fft.ifft2(x_att.astype(jnp.complex64) * x_fft, axes=(1, 2))).astype(out.dtype)
        # sca
        x_att2 = Conv2d(c, 1, dtype=self.dtype, name="conv_sca")(x_fca.mean(axis=(1, 2), keepdims=True))
        x_sca = x_att2 * x_fca
        x_sca = FGM(c, dtype=self.dtype, name="fgm")(x_sca, train)
        dw13 = Conv2d(c, (1, ker), p=(0, pad), g=c, dtype=self.dtype, name="dw_13")(out)
        dw31 = Conv2d(c, (ker, 1), p=(pad, 0), g=c, dtype=self.dtype, name="dw_31")(out)
        dw33 = Conv2d(c, ker, p=pad, g=c, dtype=self.dtype, name="dw_33")(out)
        dw11 = Conv2d(c, 1, g=c, dtype=self.dtype, name="dw_11")(out)
        y = nn.relu(x + dw13 + dw31 + dw33 + dw11 + x_sca)
        return Conv2d(c, 1, dtype=self.dtype, name="out_conv")(y)


class Multibranch(nn.Module):
    """CSP-style OmniKernel branch (reference IRSTD_YOLO.py:149)."""

    dim: int
    e: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ce = int(c * self.e)
        y = Conv(c, 1, dtype=self.dtype, name="cv1")(x, train)
        ok_branch, identity = y[..., :ce], y[..., ce:]
        ok = OmniKernel(ce, dtype=self.dtype, name="m")(ok_branch, train)
        return Conv(c, 1, dtype=self.dtype, name="cv2").call_parts([ok, identity], train)


class _BasicConv(nn.Module):
    """conv + BN + optional ReLU (reference FFCA_YOLO BasicConv)."""

    c2: int
    k: Any = 1
    s: int = 1
    p: Any = 0
    d: int = 1
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.c2, self.k, s=self.s, p=self.p, d=self.d, bias=False,
                   dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, momentum=0.99,
                         dtype=self.dtype, name="bn")(y)
        return nn.relu(y) if self.relu else y


class FEM(nn.Module):
    """Feature-enhancement module (reference FFCA_YOLO.py:138): 3 asymmetric
    dilated branches + linear fuse + scaled shortcut."""

    in_planes: int
    out_planes: int
    stride: int = 1
    scale: float = 0.1
    map_reduce: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ip = self.in_planes // self.map_reduce
        b0 = _BasicConv(2 * ip, 1, s=self.stride, dtype=self.dtype, name="b0_0")(x, train)
        b0 = _BasicConv(2 * ip, 3, p=1, relu=False, dtype=self.dtype, name="b0_1")(b0, train)
        b1 = _BasicConv(ip, 1, dtype=self.dtype, name="b1_0")(x, train)
        b1 = _BasicConv((ip // 2) * 3, (1, 3), s=self.stride, p=(0, 1), dtype=self.dtype, name="b1_1")(b1, train)
        b1 = _BasicConv(2 * ip, (3, 1), s=self.stride, p=(1, 0), dtype=self.dtype, name="b1_2")(b1, train)
        b1 = _BasicConv(2 * ip, 3, p=5, d=5, relu=False, dtype=self.dtype, name="b1_3")(b1, train)
        b2 = _BasicConv(ip, 1, dtype=self.dtype, name="b2_0")(x, train)
        b2 = _BasicConv((ip // 2) * 3, (3, 1), s=self.stride, p=(1, 0), dtype=self.dtype, name="b2_1")(b2, train)
        b2 = _BasicConv(2 * ip, (1, 3), s=self.stride, p=(0, 1), dtype=self.dtype, name="b2_2")(b2, train)
        b2 = _BasicConv(2 * ip, 3, p=5, d=5, relu=False, dtype=self.dtype, name="b2_3")(b2, train)
        out = _BasicConv(self.out_planes, 1, relu=False, dtype=self.dtype, name="linear")(
            jnp.concatenate([b0, b1, b2], -1), train
        )
        short = _BasicConv(self.out_planes, 1, s=self.stride, relu=False, dtype=self.dtype, name="shortcut")(x, train)
        return nn.relu(out * self.scale + short)


class SCAM(nn.Module):
    """Spatial context-aware module (reference FFCA_YOLO.py:43)."""

    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        avg_ = jax.nn.softmax(x.mean(axis=(1, 2)), axis=-1)  # (B, C)
        max_ = jax.nn.softmax(x.max(axis=(1, 2)), axis=-1)
        k = Conv(1, 1, dtype=self.dtype, name="k")(x, train).reshape(b, h * w)
        k = jax.nn.softmax(k, axis=-1)
        v = Conv(c, 1, dtype=self.dtype, name="v")(x, train).reshape(b, h * w, c)
        y_ch = jnp.einsum("bnc,bn->bc", v, k)[:, None, None, :]  # (B,1,1,C)
        y_avg = jnp.einsum("bc,bnc->bn", avg_, v).reshape(b, h, w, 1)
        y_max = jnp.einsum("bc,bnc->bn", max_, v).reshape(b, h, w, 1)
        y_cat = jnp.concatenate([y_avg, y_max], axis=-1)
        # m: bias-free conv without BN (+SiLU), m2: Conv with BN+SiLU
        y_ch = nn.silu(Conv2d(c, 1, bias=False, dtype=self.dtype, name="m")(y_ch))
        gate = nn.sigmoid(Conv(1, 1, dtype=self.dtype, name="m2")(y_cat, train))
        return x + y_ch * gate


class FFM_Concat2(nn.Module):
    """Fast-normalized weighted concat of 2 maps (reference FFCA_YOLO.py:85).
    Weights actual channels (the torch version's .view scrambles the axis)."""

    dimension: int = 1
    channel1: int = 1
    channel2: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c1, c2 = self.channel1, self.channel2
        w = self.param("w", nn.initializers.ones, (c1 + c2,))
        weight = w / (w.sum() + 1e-4)
        x1 = xs[0] * weight[:c1].astype(xs[0].dtype)
        x2 = xs[1] * weight[c1:].astype(xs[1].dtype)
        return jnp.concatenate([x1, x2], axis=-1)


class FFM_Concat3(nn.Module):
    """3-input variant (reference FFCA_YOLO.py:111)."""

    dimension: int = 1
    channel1: int = 1
    channel2: int = 1
    channel3: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c1, c2, c3 = self.channel1, self.channel2, self.channel3
        w = self.param("w", nn.initializers.ones, (c1 + c2 + c3,))
        weight = w / (w.sum() + 1e-4)
        x1 = xs[0] * weight[:c1].astype(xs[0].dtype)
        x2 = xs[1] * weight[c1 : c1 + c2].astype(xs[1].dtype)
        x3 = xs[2] * weight[c1 + c2 :].astype(xs[2].dtype)
        return jnp.concatenate([x1, x2, x3], axis=-1)


class CAA(nn.Module):
    """Context-anchor attention (reference PCPE_YOLO_CAA.py:6): 7×7 avgpool →
    1×1 → 1×11 and 11×1 depthwise strips → 1×1 → sigmoid gate."""

    ch: int
    h_kernel_size: int = 11
    v_kernel_size: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 7, 7, 1), (1, 1, 1, 1), ((0, 0), (3, 3), (3, 3), (0, 0))
        ) / 49.0
        y = Conv(c, 1, dtype=self.dtype, name="conv1")(y, train)
        y = Conv2d(c, (1, self.h_kernel_size), p=(0, self.h_kernel_size // 2), g=c,
                   dtype=self.dtype, name="h_conv")(y)
        y = Conv2d(c, (self.v_kernel_size, 1), p=(self.v_kernel_size // 2, 0), g=c,
                   dtype=self.dtype, name="v_conv")(y)
        y = Conv(c, 1, dtype=self.dtype, name="conv2")(y, train)
        return nn.sigmoid(y) * x


class ResBlock_CBAM(nn.Module):
    """Residual bottleneck + CBAM (reference YOLO_RACE.py:56): 1×1 → 3×3(s)
    → 1×1 convs with BN/LeakyReLU(0.1), CBAM gate, residual (projected when
    downsampling), final ReLU."""

    in_places: int
    places: int = 0
    stride: int = 1
    downsampling: bool = False
    expansion: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..attention.channel import CBAM

        places = self.places or self.in_places
        out_c = places * self.expansion

        def cbl(y, cc, k, s, name):
            y = nn.Conv(cc, (k, k), (s, s), "SAME" if k > 1 else "VALID",
                        use_bias=False, dtype=self.dtype, name=f"{name}_conv")(y)
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                name=f"{name}_bn")(y)

        y = nn.leaky_relu(cbl(x, places, 1, 1, "b0"), 0.1)
        y = nn.leaky_relu(cbl(y, places, 3, self.stride, "b1"), 0.1)
        y = cbl(y, out_c, 1, 1, "b2")
        y = CBAM(out_c, dtype=self.dtype, name="cbam")(y, train)
        res = x
        if self.downsampling or x.shape[-1] != out_c or self.stride != 1:
            res = cbl(x, out_c, 1, self.stride, "downsample")
        return nn.relu(y + res)
