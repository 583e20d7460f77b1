"""(Modulated) deformable convolution — gather-based im2col + MXU matmul.

TPU-native replacement for the reference's only real native extension: the
EQSR C++/CUDA deformable conv (modules_upsample/EQSR/dcn/src/, 1716 LoC,
JIT-loaded at deform_conv.py:10-26; SURVEY.md §2.11). Instead of a scatter
backward written by hand, the forward is expressed as bilinear gathers +
one einsum, and JAX autodiff produces the exact im2col backward. XLA fuses
the gathers; the sample grid is static apart from the learned offsets.

Semantics match torchvision.ops.deform_conv2d / DCNv2:
  * offsets: (B, Ho, Wo, dg·2·Kh·Kw) with per-tap (dy, dx) pairs;
  * optional modulation mask (B, Ho, Wo, dg·Kh·Kw), sigmoid applied by the
    caller (DCNv2 convention);
  * bilinear sampling with zero padding outside the input.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .resample import sample_bilinear_pixel


@functools.partial(jax.jit, static_argnames=("stride", "padding", "dilation", "deform_groups"))
def deform_conv2d(
    x,
    offset,
    weight,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deform_groups: int = 1,
):
    """Args:
        x: (B, H, W, Cin) input.
        offset: (B, Ho, Wo, dg*2*Kh*Kw) sample offsets, (dy, dx) per tap —
            torchvision channel layout [g, k, (dy, dx)].
        weight: (Kh, Kw, Cin, Cout) HWIO kernel.
        bias: (Cout,) or None.
        mask: (B, Ho, Wo, dg*Kh*Kw) modulation (already sigmoided) or None.

    Returns:
        (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    dg = deform_groups
    k = kh * kw

    off = offset.reshape(b, ho, wo, dg, k, 2)
    base_y = (jnp.arange(ho) * stride - padding).astype(x.dtype)
    base_x = (jnp.arange(wo) * stride - padding).astype(x.dtype)
    tap_y = (jnp.arange(kh) * dilation).astype(x.dtype)
    tap_x = (jnp.arange(kw) * dilation).astype(x.dtype)
    # (Ho, Wo, K) base sample grid
    gy = base_y[:, None, None] + jnp.repeat(tap_y, kw)[None, None, :]
    gx = base_x[None, :, None] + jnp.tile(tap_x, kh)[None, None, :]
    sy = gy[None, :, :, None, :] + off[..., 0]  # (B, Ho, Wo, dg, K)
    sx = gx[None, :, :, None, :] + off[..., 1]

    cg = cin // dg
    xg = x.reshape(b, h, w, dg, cg)
    cols = []
    for g in range(dg):
        sampled = sample_bilinear_pixel(
            xg[..., g, :], sy[..., g, :], sx[..., g, :], padding_mode="zeros"
        )  # (B, Ho, Wo, K, cg)
        if mask is not None:
            m = mask.reshape(b, ho, wo, dg, k)[..., g, :]
            sampled = sampled * m[..., None]
        cols.append(sampled)
    col = jnp.stack(cols, axis=3)  # (B, Ho, Wo, dg, K, cg)
    col = col.transpose(0, 1, 2, 4, 3, 5).reshape(b, ho, wo, k, cin)

    wmat = weight.reshape(k, cin, cout)
    out = jnp.einsum("bhwkc,kco->bhwo", col, wmat)
    if bias is not None:
        out = out + bias
    return out
