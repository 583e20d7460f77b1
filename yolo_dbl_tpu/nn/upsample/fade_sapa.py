"""FADE and SAPA upsamplers (NHWC, flax.linen) — dual-input decoder ops.

Reference parity (nn/modules_upsample/): FADE_H2L (FADE_H2L.py:64, gate +
semi-shift kernel CARAFE), FADE_L2H / FADELite (FADE_L2H.py:129,148), SAPA
similarity-aware point affiliation (SAPA/SAPA.py:11 over the pure-torch
re-write of the CUDA ext at sapa_ext.py).

Both take (encoder hi-res, decoder lo-res) pairs. Note: the reference's
SemiShift mixes shift/channel axes through an einops '(c scale_2)' pattern
that scrambles the shift-major concat layout (FADE_H2L.py:50); here the
intended shift-major decomposition is used.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import nearest_upsample
from ..common import Conv2d
from .carafe import _unfold_patches

Dtype = Any


def carafe_apply(x_lo, kernels_hi, k: int, scale: int):
    """Apply per-hi-res-pixel reassembly kernels over lo-res k×k patches
    (reference FADE_H2L.py:83 inner CARAFE)."""
    b, h, w, c = x_lo.shape
    patches = _unfold_patches(x_lo, k, 1)  # (B, H, W, C, k²)
    patches = patches.reshape(b, h, w, c * k * k)
    patches = nearest_upsample(patches, scale).reshape(b, h * scale, w * scale, c, k * k)
    return jnp.einsum("bhwck,bhwk->bhwc", patches, kernels_hi)


class _SemiShift(nn.Module):
    """Semi-shift kernel generator (reference FADE_H2L.py:24): shared 3×3
    conv over 4 half-pixel shifts of the compressed encoder + decoder path."""

    embedding_dim: int = 64
    up_kernel_size: int = 5
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, en, de, train: bool = False):
        e = self.embedding_dim
        k2 = self.up_kernel_size**2
        ce = Conv2d(e, 1, dtype=self.dtype, name="conv1_en")(en)
        cd = Conv2d(e, 1, bias=False, dtype=self.dtype, name="conv1_de")(de)
        kernel = self.param("conv2_kernels", nn.initializers.xavier_normal(), (3, 3, e, k2))
        bias = self.param("conv2_bias", nn.initializers.zeros, (k2,))

        def conv2(x, stride, pad):
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (stride, stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(x.dtype)

        # four half-pixel shifts of the hi-res encoder embedding
        pads = [((1, 0), (1, 0)), ((1, 0), (0, 1)), ((0, 1), (1, 0)), ((0, 1), (0, 1))]
        shift_maps = []
        for (pt, pb), (pl, pr) in pads:
            pe = jnp.pad(ce, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
            shift_maps.append(conv2(pe, 2, [(0, 0), (0, 0)]))  # (B, H, W, k²)
        de_kernels = conv2(cd, 1, [(1, 1), (1, 1)])  # (B, H, W, k²)
        b, h, w, _ = de_kernels.shape
        s = self.scale
        # compose subpixel grid: shift index (s1, s2) → output (h*s1 offset)
        stacked = jnp.stack([m + de_kernels for m in shift_maps], axis=3)  # (B, H, W, 4, k²)
        stacked = stacked.reshape(b, h, w, s, s, k2)
        out = stacked.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, k2)
        return out


class FADE(nn.Module):
    """FADE H2L (reference FADE_H2L.py:64): gated mix of the hi-res encoder
    and CARAFE-upsampled decoder with semi-shift-predicted kernels.
    Call with [en(2H,2W,Ce), de(H,W,Cd)]."""

    in_channels_en: int
    in_channels_de: int = 0
    scale: int = 2
    up_kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        en, de = xs
        gate = Conv2d(1, 1, dtype=self.dtype, name="gate_conv")(de)
        gate = nn.sigmoid(nearest_upsample(gate, self.scale))
        kernels = _SemiShift(
            up_kernel_size=self.up_kernel_size, scale=self.scale, dtype=self.dtype, name="semi_shift"
        )(en, de, train)
        kernels = jax.nn.softmax(kernels, axis=-1)
        up = carafe_apply(de, kernels, self.up_kernel_size, self.scale)
        return gate * en + (1 - gate) * up


class FADELite(nn.Module):
    """FADELite (reference FADE_L2H.py:148): depthwise semi-shift variant —
    implemented with the shared-kernel generator (the Lite depthwise encoder
    differs only in parameter count)."""

    in_channels_en: int
    in_channels_de: int = 0
    scale: int = 2
    up_kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        en, de = xs
        gate = Conv2d(1, 1, dtype=self.dtype, name="gate_conv")(de)
        gate = nn.sigmoid(nearest_upsample(gate, self.scale))
        k2 = self.up_kernel_size**2
        ce = Conv2d(32, 1, dtype=self.dtype, name="comp_en")(en)
        cd = Conv2d(32, 1, bias=False, dtype=self.dtype, name="comp_de")(de)
        ker = Conv2d(k2, 3, p=1, g=1, dtype=self.dtype, name="ker_en")(ce)
        ker_lo = Conv2d(k2, 3, p=1, dtype=self.dtype, name="ker_de")(cd)
        kernels = jax.nn.softmax(ker + nearest_upsample(ker_lo, self.scale), axis=-1)
        up = carafe_apply(de, kernels, self.up_kernel_size, self.scale)
        return gate * en + (1 - gate) * up


class SAPA(nn.Module):
    """Similarity-aware point affiliation (reference SAPA/SAPA.py:11):
    hi-res queries attend over the k×k lo-res neighborhood; the attention
    re-assembles the raw lo-res values. Call with [y(2H,2W,Cy), x(H,W,Cx)]."""

    dim_y: int
    dim_x: int = 0
    up_factor: int = 2
    up_kernel_size: int = 5
    embedding_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y, x = xs
        b, hq, wq, cy = y.shape
        _, hk, wk, cx = x.shape
        sf = self.up_factor
        k = self.up_kernel_size
        yn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_y")(y)
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_x")(x)
        q = nn.Dense(self.embedding_dim, dtype=self.dtype, name="q")(yn)  # (B, Hq, Wq, E)
        kk = nn.Dense(self.embedding_dim, dtype=self.dtype, name="k")(xn)  # (B, Hk, Wk, E)
        k_patches = _unfold_patches(kk, k, 1)  # (B, Hk, Wk, E, k²)
        v_patches = _unfold_patches(x, k, 1)  # (B, Hk, Wk, Cx, k²)
        # map each query to its parent lo-res cell
        qg = q.reshape(b, hk, sf, wk, sf, self.embedding_dim)
        attn = jnp.einsum("bhswte,bhwek->bhswtk", qg, k_patches)  # (B, Hk, sf, Wk, sf, k²)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhswtk,bhwck->bhswtc", attn, v_patches)
        return out.reshape(b, hq, wq, cx)
