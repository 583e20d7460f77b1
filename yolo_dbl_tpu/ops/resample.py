"""Spatial resampling primitives for NHWC feature maps.

JAX-native equivalents of the torch ops the reference leans on for its
upsampler pool (grid_sample/pixel_shuffle in modules_upsample/DySample.py:49-61,
nn.Upsample, nn.AvgPool2d). Implemented as gathers/reshapes that XLA fuses;
no host round-trips, fixed shapes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def nearest_upsample(x, scale: int = 2):
    """Nearest-neighbor 2x (or Nx) upsample of NHWC tensors."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def avg_pool2(x):
    """2x2 average pool, stride 2, no padding (torch nn.AvgPool2d(2)) on NHWC.

    Expressed as a depthwise 2x2 stride-2 conv: the reshape(b,h/2,2,w/2,2,c)
    + mean form forces a sublane relayout on TPU (measured 2.48 ms at
    64x80x80x256 bf16 vs 0.87 ms for the conv — tools/exp_pool_up.py);
    XLA's conv path streams it at near-HBM speed. Same math: sum of the 4
    phase taps x 0.25, fp32 accumulation on the MXU.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:  # torch AvgPool2d(2) drops trailing odd row/col
        x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    win = jnp.full((2, 2, 1, c), 0.25, x.dtype)
    return jax.lax.conv_general_dilated(
        x, win, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


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


def grid_sample_bilinear(x, coords, padding_mode: str = "border", align_corners: bool = False,
                         prefer_onehot=None, prefer_unroll=None):
    """Bilinear grid sample, align_corners=False, 'border' or 'zeros' padding.

    Matches torch.nn.functional.grid_sample(x, grid, mode='bilinear',
    align_corners=False) as used by DySample
    (reference modules_upsample/DySample.py:58-61), but on NHWC input.

    Args:
        x: (B, H, W, C) source features.
        coords: (B, Ho, Wo, 2) normalized sample grid in [-1, 1], xy order.
        prefer_onehot: allow the one-hot-matmul fast path (False under
            training; None = auto by backend — see sample_bilinear_pixel).
        prefer_unroll: unroll the one-hot chunk loop (True for inference,
            where it kills the lax.map boundary relayouts — measured
            1.025x e2e at b128; None/False = lax.map, which bounds the
            backward live set under grad).

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
    return sample_bilinear_pixel(x, gy, gx, padding_mode, prefer_onehot,
                                 prefer_unroll)


# Sources up to this many pixels go through the one-hot-matmul sampling path
# (MXU); larger sources fall back to take_along_axis gathers. Measured on
# v5e at DySample's hot shapes (bg=256, c=64): one-hot 10.1 ms vs gather
# 60.4 ms for 40x40 -> 80x80, 4.3 vs 18.8 ms for 20x20 -> 40x40.
_ONEHOT_MAX_SRC = 4096
# cap on materialized one-hot matrix bytes per lax.map chunk (sweep at b128
# was flat across 128 MB-1 GB — tools/exp_dysample_chunk.py; smaller bounds
# the backward-pass live set)
_ONEHOT_CHUNK_BYTES = 256 * 1024 * 1024


def _sample_bilinear_onehot(x, gy, gx, padding_mode, prefer_unroll=None):
    """Bilinear sampling as a dense (N_out, H*W) interpolation-matrix matmul.

    TPU gathers are slow generic scatters; for small source maps the exact
    same computation expressed as one-hot weights x source rides the MXU
    ~6x faster. Identical math to the gather path: 4 corner weights, border
    clip or zeros masking, gradient flows through the weights.
    """
    b, h, w, c = x.shape
    s = h * w
    out_shape = gy.shape[1:]
    n = 1
    for d in out_shape:
        n = n * d
    gy = gy.reshape(b, n)
    gx = gx.reshape(b, n)
    y0f = jnp.floor(gy)
    x0f = jnp.floor(gx)
    wy = (gy - y0f).astype(x.dtype)
    wx = (gx - x0f).astype(x.dtype)
    ar = jnp.arange(s, dtype=jnp.int32)

    def corner(yi, xi, wgt):
        yic = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xic = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        if padding_mode == "zeros":
            inb = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            wgt = wgt * inb.astype(wgt.dtype)
        return ((yic * w + xic)[..., None] == ar) * wgt[..., None]

    # checkpoint: under grad, the (chunk, N, S) one-hot matrix must be
    # REBUILT in the backward pass, not saved — lax.map's scan otherwise
    # retains every chunk's A (observed: 5x 1.22 GB HLO temps OOMing a b16
    # train step at 640)
    @jax.checkpoint
    def build_and_mul(args):
        xf, yy0, xx0, wwy, wwx = args
        A = (
            corner(yy0, xx0, (1 - wwy) * (1 - wwx))
            + corner(yy0, xx0 + 1, (1 - wwy) * wwx)
            + corner(yy0 + 1, xx0, wwy * (1 - wwx))
            + corner(yy0 + 1, xx0 + 1, wwy * wwx)
        )
        return jnp.einsum("bns,bsc->bnc", A.astype(xf.dtype), xf)

    flat = x.reshape(b, s, c)
    itemsize = jnp.dtype(x.dtype).itemsize
    per_image = n * s * itemsize
    ch = max(1, min(b, _ONEHOT_CHUNK_BYTES // max(per_image, 1)))
    while b % ch:
        ch -= 1
    env = os.environ.get("YOLO_DBL_ONEHOT_UNROLL")
    if env not in (None, ""):
        unroll = env not in ("0", "false")
    else:
        unroll = bool(prefer_unroll)
    if ch == b:
        out = build_and_mul((flat, y0f, x0f, wy, wx))
    elif unroll:
        # Unrolled chunking (inference default on TPU; YOLO_DBL_ONEHOT_UNROLL
        # forces either way): static slices + concat instead of lax.map. The
        # while loop forces its carried chunk buffers into a loop-fixed
        # layout, costing ~840 MB of entry/exit relayout copies per b128
        # step at the 40->80 DySample sites (round-5 traffic map); unrolling
        # lets layout assignment propagate freely. Same math, same per-chunk
        # checkpoint, outputs bitwise identical; measured 1192 -> 1222
        # img/s/chip e2e (tools/exp_onehot_unroll.py, 2026-08-20). Training
        # keeps lax.map: its serialized chunks bound the backward live set
        # (the round-2 one-hot OOM pattern).
        out = jnp.concatenate(
            [
                build_and_mul((
                    flat[i * ch:(i + 1) * ch],
                    y0f[i * ch:(i + 1) * ch],
                    x0f[i * ch:(i + 1) * ch],
                    wy[i * ch:(i + 1) * ch],
                    wx[i * ch:(i + 1) * ch],
                ))
                for i in range(b // ch)
            ],
            axis=0,
        )
    else:
        out = jax.lax.map(
            build_and_mul,
            (
                flat.reshape(b // ch, ch, s, c),
                y0f.reshape(b // ch, ch, n),
                x0f.reshape(b // ch, ch, n),
                wy.reshape(b // ch, ch, n),
                wx.reshape(b // ch, ch, n),
            ),
        ).reshape(b, n, c)
    return out.reshape(b, *out_shape, c)


def sample_bilinear_pixel(x, gy, gx, padding_mode: str = "border",
                          prefer_onehot=None, prefer_unroll=None):
    """Bilinear sample NHWC `x` at pixel coordinates gy/gx (B, ...).

    prefer_onehot=False forces the gather path — the right choice inside a
    training step: the one-hot interpolation matrix is a 6x inference win on
    the MXU but its backward residuals dominate HBM (pass not-train from the
    caller, e.g. DySample). None = auto: the one-hot path is a TPU-specific
    trick (dense matmuls ride the MXU, gathers are slow generic scatters);
    on CPU/GPU backends the gather path wins by ~40x, so auto picks by
    jax.default_backend()."""
    b, h, w, c = x.shape
    # the pinned default device (tests/conftest.py) wins over backend
    # priority: computations actually run there
    from ..utils.device import committed_platform

    plat = committed_platform()
    if prefer_onehot is None:
        prefer_onehot = plat == "tpu"
    if prefer_onehot and h * w <= _ONEHOT_MAX_SRC:
        if plat == "tpu" and os.environ.get("YOLO_DBL_PALLAS_SAMPLE"):
            # opt-in Pallas path (kernels/sampling.py): measured SLOWER than
            # the XLA one-hot at the b128 flagship (670 vs 940 img/s,
            # 2026-08-17 A/B on v5e) — XLA already fuses the A-build into
            # the dot, and the kernel's K=40 spreader matmuls pad to K=128
            # on the MXU. Kept for re-testing on future toolchains.
            from ..kernels.sampling import sample_bilinear_separable, supported

            gyf = gy.reshape(b, -1)
            gxf = gx.reshape(b, -1)
            if supported(x, gyf, gxf):
                out = sample_bilinear_separable(x, gyf, gxf, padding_mode)
                return out.reshape(b, *gy.shape[1:], c)
        return _sample_bilinear_onehot(x, gy, gx, padding_mode, prefer_unroll)
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
