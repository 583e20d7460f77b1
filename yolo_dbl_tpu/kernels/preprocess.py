"""Pallas kernel: fused letterbox + normalize preprocessing.

SURVEY.md §2.11 / §7-7 north-star item: the reference's cv2/albumentations
per-sample CPU path (global_utils/transforms.py letterbox+normalize, YOLO
LetterBox at data/augment.py:1477 + predictor /255 at engine/predictor.py:116)
becomes ONE device pass: uint8 HWC frames stream HBM→VMEM once, are
BILINEAR-resized (cv2.INTER_LINEAR half-pixel convention), padded with 114
and scaled to [0,1] float — no host float conversion (4x less PCIe/ICI
traffic: bytes move as uint8) and no separate pad/convert/normalize HBM
round-trips.

Geometry matches data/augment.py:letterbox exactly (gain, round(d-0.1) pad
rounding, scaleup flag), so the predictor's gain/pad box-rescale stays valid.

Grid: one program per (image, output-row-tile). The source image sits in
VMEM; each program gathers its 4 bilinear corners from the uint8 source
(converting only the gathered values) and emits a (TILE_H, W_out, 3) float
tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# sources larger than this stay on the XLA fallback (whole image must fit
# VMEM alongside the output tile; v5e VMEM is ~16 MB)
_VMEM_SRC_LIMIT = 8 * 1024 * 1024


def letterbox_geometry(h_in: int, w_in: int, h_out: int, w_out: int, scaleup: bool = True):
    """Static letterbox geometry, identical to data/augment.py:letterbox:
    gain r (capped at 1 when scaleup=False), resized size, and the reference's
    round(d - 0.1) top/left pad rounding."""
    r = min(h_out / h_in, w_out / w_in)
    if not scaleup:
        r = min(r, 1.0)
    new_h, new_w = round(h_in * r), round(w_in * r)
    dh, dw = (h_out - new_h) / 2, (w_out - new_w) / 2
    top, left = round(dh - 0.1), round(dw - 0.1)
    return r, new_h, new_w, top, left


def _letterbox_kernel(src_ref, out_ref, *, h_in, w_in, w_out, tile_h,
                      new_h, new_w, top, left, pad_value):
    """src_ref: (1, h_in, w_in, 3) uint8 VMEM; out_ref: (1, tile_h, w_out, 3) f32."""
    t = pl.program_id(1)
    row0 = t * tile_h

    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_out), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_out), 1)
    # bilinear source coords, cv2.INTER_LINEAR half-pixel convention
    sy = (rows - top).astype(jnp.float32) * (h_in / new_h) + (0.5 * h_in / new_h - 0.5)
    sx = (cols - left).astype(jnp.float32) * (w_in / new_w) + (0.5 * w_in / new_w - 0.5)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0c = jnp.clip(y0, 0, h_in - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, h_in - 1).astype(jnp.int32)
    x0c = jnp.clip(x0, 0, w_in - 1).astype(jnp.int32)
    x1c = jnp.clip(x0 + 1, 0, w_in - 1).astype(jnp.int32)
    inside = (rows >= top) & (rows < top + new_h) & (cols >= left) & (cols < left + new_w)

    flat = src_ref[0].reshape(h_in * w_in, 3)

    def take(yi, xi):
        # gather stays uint8; only the gathered values convert to f32
        return jnp.take(flat, (yi * w_in + xi).reshape(-1), axis=0).reshape(
            tile_h, w_out, 3).astype(jnp.float32)

    val = (take(y0c, x0c) * (1 - wy) * (1 - wx)
           + take(y0c, x1c) * (1 - wy) * wx
           + take(y1c, x0c) * wy * (1 - wx)
           + take(y1c, x1c) * wy * wx)
    out = jnp.where(inside[..., None], val, jnp.float32(pad_value))
    out_ref[0] = out / 255.0


@functools.partial(jax.jit, static_argnames=("out_hw", "tile_h", "pad_value",
                                             "scaleup", "interpret"))
def letterbox_normalize(images_u8, out_hw=(640, 640), tile_h=64, pad_value=114,
                        scaleup=False, interpret=False):
    """Fused device preprocessing (Pallas; XLA fallback for oversized sources).

    Args:
        images_u8: (B, H, W, 3) uint8 batch (one source size per call —
            bucket mixed sizes on the host).
        out_hw: letterboxed output size (stride-aligned).
        scaleup: allow upscaling small sources (predictor uses False, like
            the reference's LetterBox(scaleup=False) eval path).

    Returns:
        (B, h_out, w_out, 3) float32 in [0, 1], padded with 114/255.
    """
    b, h_in, w_in, _ = images_u8.shape
    if h_in * w_in * 3 > _VMEM_SRC_LIMIT:
        return letterbox_normalize_xla(images_u8, out_hw, pad_value, scaleup)
    h_out, w_out = out_hw
    _, new_h, new_w, top, left = letterbox_geometry(h_in, w_in, h_out, w_out, scaleup)
    tile_h = min(tile_h, h_out)
    while h_out % tile_h:
        tile_h //= 2
    n_tiles = h_out // tile_h

    kernel = functools.partial(
        _letterbox_kernel,
        h_in=h_in, w_in=w_in, w_out=w_out, tile_h=tile_h,
        new_h=new_h, new_w=new_w, top=top, left=left, pad_value=pad_value,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, h_in, w_in, 3), lambda i, t: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, tile_h, w_out, 3), lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, 3), jnp.float32),
        interpret=interpret,
    )(images_u8)


def device_normalize(img, dtype=jnp.float32):
    """uint8 NHWC → [0,1] float on device (the /255 the reference does on
    host at engine/predictor.py:116 / trainer preprocess_batch); float input
    passes through (already normalized by the legacy host path)."""
    if img.dtype == jnp.uint8:
        return img.astype(dtype) / 255.0
    return img.astype(dtype) if img.dtype != dtype else img


def _bilinear_matrix(n_out: int, n_in: int):
    """(n_out, n_in) sparse row matrix of bilinear weights, cv2 half-pixel
    convention — resize along one axis is then a single matmul (MXU), the
    same one-hot-interpolation trick as ops/resample.py."""
    import numpy as np

    r = np.arange(n_out, dtype=np.float64)
    s = r * (n_in / n_out) + (0.5 * n_in / n_out - 0.5)
    lo = np.floor(s)
    w = (s - lo).astype(np.float32)
    lo0 = np.clip(lo, 0, n_in - 1).astype(np.int64)
    lo1 = np.clip(lo + 1, 0, n_in - 1).astype(np.int64)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo0] += 1.0 - w
    m[np.arange(n_out), lo1] += w
    return m


@functools.partial(jax.jit, static_argnames=("out_hw", "pad_value", "scaleup", "dtype"))
def letterbox_normalize_onehot(images_u8, out_hw=(640, 640), pad_value=114,
                               scaleup=False, dtype=jnp.float32):
    """Separable-bilinear letterbox as two MXU matmuls: out = RY @ img @ RXᵀ
    per channel, then 114-pad + /255. Same geometry as the Pallas kernel /
    XLA twin; candidate TPU default (gathers are scatter-class on TPU, two
    dense matmuls ride the MXU — ops/resample.py's measured lesson)."""
    b, h_in, w_in, _ = images_u8.shape
    h_out, w_out = out_hw
    _, new_h, new_w, top, left = letterbox_geometry(h_in, w_in, h_out, w_out, scaleup)
    ry = jnp.asarray(_bilinear_matrix(new_h, h_in), dtype)
    rx = jnp.asarray(_bilinear_matrix(new_w, w_in), dtype)
    img = images_u8.astype(dtype)
    resized = jnp.einsum("rh,bhwc->brwc", ry, img)
    resized = jnp.einsum("sw,brwc->brsc", rx, resized)
    canvas = jnp.full((b, h_out, w_out, 3), jnp.asarray(pad_value, dtype), dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, top, left, 0))
    return canvas / 255.0


@functools.partial(jax.jit, static_argnames=("out_hw", "pad_value", "scaleup"))
def letterbox_normalize_xla(images_u8, out_hw=(640, 640), pad_value=114, scaleup=False):
    """XLA twin of the kernel (CPU fallback / oversized sources): bilinear
    resize (jax.image half-pixel = cv2.INTER_LINEAR) + 114 pad + /255."""
    b, h_in, w_in, _ = images_u8.shape
    h_out, w_out = out_hw
    _, new_h, new_w, top, left = letterbox_geometry(h_in, w_in, h_out, w_out, scaleup)
    # antialias=False: plain bilinear like cv2.INTER_LINEAR (and the kernel);
    # jax's default antialiased downscale would diverge from the reference
    resized = jax.image.resize(images_u8.astype(jnp.float32), (b, new_h, new_w, 3),
                               "linear", antialias=False)
    canvas = jnp.full((b, h_out, w_out, 3), float(pad_value), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, top, left, 0))
    return canvas / 255.0
