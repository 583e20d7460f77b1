"""CARAFE-family content-aware upsamplers (NHWC, flax.linen).

Reference parity (nn/modules_upsample/): CARAFE (YOLO_RACE.py:10 — the
variant registered in parse_model), CARAFE_XiaLiPKU (CARAFE/CARAFE_XiaLiPKU.py:28),
CARAFE_simplified (CARAFE/CARAFE_simplified.py:5), DLU (= DLU_XiaLiPKU,
CARAFE/CARAFE_XiaLiPKU.py:72). The reference replaced the official CUDA
extension with unfold/einsum re-implementations; here the unfold is a stack
of shifted pads (static shapes, XLA fuses it into the weighted-sum einsum,
which rides the MXU).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import nearest_upsample, pixel_shuffle
from ..common import Conv, Conv2d

Dtype = Any


def _unfold_patches(x, k: int, dilation: int = 1):
    """Extract k×k dilated patches per pixel: (B, H, W, C) → (B, H, W, C, k²).

    Matches torch nn.Unfold(kernel_size=k, dilation=d, padding=k//2*d)
    with the same (ki, kj) row-major patch ordering.
    """
    b, h, w, c = x.shape
    p = (k // 2) * dilation
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    slices = []
    for i in range(k):
        for j in range(k):
            slices.append(
                jax.lax.dynamic_slice(xp, (0, i * dilation, j * dilation, 0), (b, h, w, c))
            )
    return jnp.stack(slices, axis=-1)  # (B, H, W, C, k²)


class CARAFE(nn.Module):
    """Registered CARAFE variant (reference YOLO_RACE.py:10): low-res 3×3
    reassembly with per-subpixel kernels, then pixel-shuffle to 2x."""

    c1: int
    c2: int = 0
    kernel_size: int = 3
    up_factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k, s = self.kernel_size, self.up_factor
        c2 = self.c2 or c
        kt = Conv2d(c // 4, 1, dtype=self.dtype, name="down")(x)
        kt = Conv2d(s * s * k * k, k, p=k // 2, dtype=self.dtype, name="encoder")(kt)
        # channels laid out (k², s, s); softmax over the k² kernel axis
        wgt = kt.reshape(b, h, w, k * k, s * s)
        wgt = jax.nn.softmax(wgt, axis=3)
        patches = _unfold_patches(x, k, dilation=1)  # (B, H, W, C, k²)
        out = jnp.einsum("bhwck,bhwks->bhwcs", patches, wgt)
        out = out.reshape(b, h, w, c * s * s)
        out = pixel_shuffle(out, s)
        return Conv2d(c2, 1, dtype=self.dtype, name="out")(out)


class _OfficialStyleCARAFE(nn.Module):
    """Shared body for XiaLiPKU/simplified variants: hi-res unfold with
    dilation=scale over the nearest-upsampled input."""

    c: int
    c_mid: int = 64
    scale: int = 2
    k_up: int = 5
    k_enc: int = 3
    comp_act: str = "relu"  # 'relu' (XiaLiPKU ConvBNReLU) or 'silu' (simplified uses Conv)
    dsconv_enc: bool = False  # DLU uses a depthwise-separable encoder
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, ku = self.scale, self.k_up
        h_, w_ = h * s, w * s
        wgt = Conv2d(self.c_mid, 1, bias=False, dtype=self.dtype, name="comp_conv")(x)
        wgt = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="comp_bn")(wgt)
        wgt = nn.relu(wgt) if self.comp_act == "relu" else nn.silu(wgt)
        if self.dsconv_enc:
            wgt = Conv2d(self.c_mid, self.k_enc, p=self.k_enc // 2, g=self.c_mid, bias=False,
                         dtype=self.dtype, name="enc_dw")(wgt)
            wgt = Conv2d((s * ku) ** 2, 1, bias=False, dtype=self.dtype, name="enc_pw")(wgt)
        else:
            wgt = Conv2d((s * ku) ** 2, self.k_enc, p=self.k_enc // 2, bias=False,
                         dtype=self.dtype, name="enc_conv")(wgt)
            wgt = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="enc_bn")(wgt)
        wgt = pixel_shuffle(wgt, s)  # (B, H_, W_, k_up²)
        wgt = jax.nn.softmax(wgt, axis=-1)
        xu = nearest_upsample(x, s)
        patches = _unfold_patches(xu, ku, dilation=s)  # (B, H_, W_, C, k_up²)
        return jnp.einsum("bhwck,bhwk->bhwc", patches, wgt)


class CARAFE_XiaLiPKU(_OfficialStyleCARAFE):
    pass


class CARAFE_simplified(nn.Module):
    """reference CARAFE_simplified.py:5 — ultralytics-Conv compressor."""

    c: int
    k_enc: int = 3
    k_up: int = 5
    c_mid: int = 64
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, ku = self.scale, self.k_up
        wgt = Conv(self.c_mid, 1, dtype=self.dtype, name="comp")(x, train)
        wgt = Conv((s * ku) ** 2, self.k_enc, act=False, dtype=self.dtype, name="enc")(wgt, train)
        wgt = pixel_shuffle(wgt, s)
        wgt = jax.nn.softmax(wgt, axis=-1)
        xu = nearest_upsample(x, s)
        patches = _unfold_patches(xu, ku, dilation=s)
        return jnp.einsum("bhwck,bhwk->bhwc", patches, wgt)


class DLU(_OfficialStyleCARAFE):
    """Downsample-lookup upsampler (reference DLU_XiaLiPKU, CARAFE_XiaLiPKU.py:72):
    CARAFE with a depthwise-separable kernel encoder."""

    dsconv_enc: bool = True


class CARAFEPack(nn.Module):
    """Official CARAFE package (reference CARAFE_official.py:260): 1×1
    channel compressor → content encoder predicting s²·g·k² kernels at LOW
    res → pixel-shuffle to hi-res → softmax over k² per group → reassemble
    k×k low-res neighborhoods (expressed as a dilated unfold over the
    nearest-upsampled input — same gather the CUDA op does)."""

    channels: int
    scale_factor: int = 2
    up_kernel: int = 5
    up_group: int = 1
    encoder_kernel: int = 3
    encoder_dilation: int = 1
    compressed_channels: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, ku, g = self.scale_factor, self.up_kernel, self.up_group
        comp = Conv2d(self.compressed_channels, 1, dtype=self.dtype, name="channel_compressor")(x)
        pad = (self.encoder_kernel - 1) * self.encoder_dilation // 2
        mask = Conv2d(ku * ku * g * s * s, self.encoder_kernel, p=pad,
                      d=self.encoder_dilation, dtype=self.dtype, name="content_encoder")(comp)
        # kernel_normalizer: shuffle to hi-res, softmax over the k² axis
        mask = pixel_shuffle(mask, s)  # (B, sH, sW, g·k²)
        mask = mask.reshape(b, s * h, s * w, g, ku * ku)
        mask = jax.nn.softmax(mask, axis=-1)
        up = nearest_upsample(x, s)
        patches = _unfold_patches(up, ku, dilation=s)  # (B, sH, sW, C, k²)
        patches = patches.reshape(b, s * h, s * w, g, c // g, ku * ku)
        out = jnp.einsum("bhwgck,bhwgk->bhwgc", patches, mask)
        return out.reshape(b, s * h, s * w, c)
