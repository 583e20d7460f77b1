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

Kernel form (round 3): gather-free SEPARABLE MATMULS. The first cut gathered
the 4 bilinear corners per output pixel with jnp.take — Mosaic's gather
lowering rejects that shape ("Shape mismatch in input, indices and output",
reproduced on the v5e 2026-08-18), so the gather kernel only ever ran in
interpret mode. Bilinear resize is separable, so each program instead
computes out_tile = RY_tile @ src @ RXᵀ — two dense dots on the MXU with
2-sparse interpolation-row matrices (the same one-hot-matmul lesson as
ops/resample.py: TPU gathers are scatter-class, dense dots ride the MXU).
Channels go PLANAR before the kernel ((B,H,W,3) → (B·3,H,W)): a
3-wide minor dim would pad to 128 VMEM lanes (42× waste); planar blocks
tile perfectly. uint8 → f32 conversion happens in VMEM on the src block.

Grid: one program per (image-plane, output-row-tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# sources larger than this stay on the XLA fallback (one uint8 channel plane
# must fit VMEM alongside the interp matrices + output tile; v5e ~16 MB)
_VMEM_SRC_LIMIT = 8 * 1024 * 1024
_MAX_SRC_SIDE = 4096  # bounds the (w_out, w_in)/(tile_h, h_in) f32 matrices


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


def _letterbox_kernel(src_ref, ry_ref, rx_ref, out_ref, *, tile_h, w_out,
                      new_h, new_w, top, left, pad_value, precision):
    """One channel-plane, one output-row tile.

    src_ref: (1, h_in, w_in) uint8; ry_ref: (tile_h, h_in) f32 row-interp
    slice; rx_ref: (w_out, w_in) f32 column-interp matrix;
    out_ref: (1, tile_h, w_out) f32.
    """
    t = pl.program_id(1)
    row0 = t * tile_h
    # u8→f32 in VMEM; Mosaic on this toolchain has no direct u8→f32 cast
    # (NotImplementedError) but u8→i32→f32 lowers fine
    srcf = src_ref[0].astype(jnp.int32).astype(jnp.float32)
    # Precision choice (see letterbox_normalize): HIGHEST = 6 bf16 MXU
    # passes, exact to ~6e-5; DEFAULT = 1 pass, ~1.3 u8 steps of error on
    # [0,1] output (measured 5.2e-3 vs the XLA twin on v5e) — below the
    # bf16 OUTPUT quantization (~2e-3), so the bf16-out serving lane uses
    # DEFAULT and saves ~6x the matmul work (these dense 2-sparse dots are
    # the kernel's entire FLOP cost: ~433 GFLOP per 128x512x768 batch).
    tmp = jnp.dot(ry_ref[...], srcf, preferred_element_type=jnp.float32,
                  precision=precision)
    val = jax.lax.dot_general(  # contract w_in: (tile_h, w_in)·(w_out, w_in)ᵀ
        tmp, rx_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_out), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_out), 1)
    inside = (rows >= top) & (rows < top + new_h) & (cols >= left) & (cols < left + new_w)
    out_ref[0] = (jnp.where(inside, val, jnp.float32(pad_value)) / 255.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "tile_h", "pad_value",
                                             "scaleup", "interpret", "out_dtype",
                                             "precision"))
def letterbox_normalize(images_u8, out_hw=(640, 640), tile_h=64, pad_value=114,
                        scaleup=False, interpret=False, out_dtype=jnp.float32,
                        precision=None):
    """Fused device preprocessing (Pallas; XLA fallback for oversized sources).

    Args:
        images_u8: (B, H, W, 3) uint8 batch (one source size per call —
            bucket mixed sizes on the host).
        out_hw: letterboxed output size (stride-aligned).
        scaleup: allow upscaling small sources (predictor uses False, like
            the reference's LetterBox(scaleup=False) eval path).

    Returns:
        (B, h_out, w_out, 3) out_dtype in [0, 1], padded with 114/255.
        (out_dtype=bfloat16 halves the output HBM footprint — used by the
        scanned u8 e2e protocol where K batches are letterboxed in one op.)

    precision=None auto-selects the interpolation-dot precision: DEFAULT
    (single-pass bf16 MXU) when the output is bfloat16 — the dot error
    (~5e-3 on [0,1]) hides under bf16 output quantization — and HIGHEST
    (exact to 6e-5) for float32 outputs, where callers may compare against
    the cv2/XLA references bit-closely.
    """
    import numpy as np

    if precision is None:
        precision = (jax.lax.Precision.DEFAULT if out_dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
    b, h_in, w_in, _ = images_u8.shape
    if h_in * w_in > _VMEM_SRC_LIMIT or max(h_in, w_in) > _MAX_SRC_SIDE:
        return letterbox_normalize_xla(images_u8, out_hw, pad_value,
                                       scaleup).astype(out_dtype)
    h_out, w_out = out_hw
    _, new_h, new_w, top, left = letterbox_geometry(h_in, w_in, h_out, w_out, scaleup)
    tile_h = min(tile_h, h_out)
    while h_out % tile_h:
        tile_h //= 2
    n_tiles = h_out // tile_h

    # full-canvas interpolation matrices: pad rows/cols are all-zero (the
    # in-kernel mask overwrites them with pad_value anyway)
    ry = np.zeros((h_out, h_in), np.float32)
    ry[top:top + new_h] = _bilinear_matrix(new_h, h_in)
    rx = np.zeros((w_out, w_in), np.float32)
    rx[left:left + new_w] = _bilinear_matrix(new_w, w_in)

    planar = images_u8.transpose(0, 3, 1, 2).reshape(b * 3, h_in, w_in)
    kernel = functools.partial(
        _letterbox_kernel,
        tile_h=tile_h, w_out=w_out,
        new_h=new_h, new_w=new_w, top=top, left=left, pad_value=pad_value,
        precision=precision,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * 3, n_tiles),
        in_specs=[
            pl.BlockSpec((1, h_in, w_in), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((tile_h, h_in), lambda i, t: (t, 0)),
            pl.BlockSpec((w_out, w_in), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w_out), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b * 3, h_out, w_out), out_dtype),
        interpret=interpret,
    )(planar, jnp.asarray(ry), jnp.asarray(rx))
    return out.reshape(b, 3, h_out, w_out).transpose(0, 2, 3, 1)


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
    hi = jax.lax.Precision.HIGHEST  # default TPU f32 dots run bf16 passes
    resized = jnp.einsum("rh,bhwc->brwc", ry, img, precision=hi)
    resized = jnp.einsum("sw,brwc->brsc", rx, resized, precision=hi)
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
