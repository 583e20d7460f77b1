"""Spatial resampling primitives for NHWC feature maps.

JAX-native equivalents of the torch ops the reference leans on for its
upsampler pool (grid_sample/pixel_shuffle in modules_upsample/DySample.py:49-61,
nn.Upsample, nn.AvgPool2d). Implemented as gathers/reshapes that XLA fuses;
no host round-trips, fixed shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_upsample(x, scale: int = 2):
    """Nearest-neighbor 2x (or Nx) upsample of NHWC tensors."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def avg_pool2(x):
    """2x2 average pool, stride 2, no padding (torch nn.AvgPool2d(2)) on NHWC."""
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2, :].reshape(b, h2, 2, w2, 2, c)
    return x.mean(axis=(2, 4))


def max_pool(x, k: int, stride: int = 1, padding: int = 0):
    """Max pool with torch-style symmetric int padding on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def pixel_shuffle(x, r: int):
    """Rearrange NHWC (B, H, W, C*r^2) -> (B, H*r, W*r, C), matching
    torch.pixel_shuffle channel ordering (channel-major: c, dy, dx)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x, r: int):
    """Inverse of pixel_shuffle: (B, H*r, W*r, C) -> (B, H, W, C*r^2)."""
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, r, r
    return x.reshape(b, h, w, c * r * r)


def bilinear_upsample(x, scale: int = 2, align_corners: bool = True):
    """Bilinear NHWC upsample via two 1-D interpolation matmuls (MXU-friendly).

    Matches torch F.interpolate(mode='bilinear') for both align_corners modes.
    """
    import numpy as np

    b, h, w, c = x.shape
    oh, ow = h * scale, w * scale

    def interp_matrix(n_in, n_out):
        if align_corners:
            src = np.linspace(0, n_in - 1, n_out) if n_out > 1 else np.zeros(1)
        else:
            src = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
            src = np.clip(src, 0, n_in - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = src - lo
        m = np.zeros((n_out, n_in), dtype=np.float32)
        m[np.arange(n_out), lo] += 1 - frac
        m[np.arange(n_out), hi] += frac
        return jnp.asarray(m)

    mh = interp_matrix(h, oh).astype(x.dtype)
    mw = interp_matrix(w, ow).astype(x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, y)


def grid_sample_bilinear(x, coords, padding_mode: str = "border", align_corners: bool = False):
    """Bilinear grid sample, align_corners=False, 'border' or 'zeros' padding.

    Matches torch.nn.functional.grid_sample(x, grid, mode='bilinear',
    align_corners=False) as used by DySample
    (reference modules_upsample/DySample.py:58-61), but on NHWC input.

    Args:
        x: (B, H, W, C) source features.
        coords: (B, Ho, Wo, 2) normalized sample grid in [-1, 1], xy order.

    Returns:
        (B, Ho, Wo, C) sampled features.
    """
    b, h, w, c = x.shape
    if align_corners:
        gx = (coords[..., 0] + 1.0) * (w - 1) / 2.0
        gy = (coords[..., 1] + 1.0) * (h - 1) / 2.0
    else:
        gx = (coords[..., 0] + 1.0) * (w / 2.0) - 0.5
        gy = (coords[..., 1] + 1.0) * (h / 2.0) - 0.5
    return sample_bilinear_pixel(x, gy, gx, padding_mode)


def sample_bilinear_pixel(x, gy, gx, padding_mode: str = "border"):
    """Bilinear sample NHWC `x` at pixel coordinates gy/gx (B, ...)."""
    b, h, w, c = x.shape
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        yic = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xic = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        idx = yic * w + xic
        vals = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1).reshape(
            b, *idx.shape[1:], c
        )
        if padding_mode == "zeros":
            inb = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))[..., None]
            vals = jnp.where(inb, vals, 0.0)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
