"""Pallas kernel: fused letterbox + normalize preprocessing.

SURVEY.md §2.11 / §7-7 north-star item: the reference's cv2/albumentations
per-sample CPU path (global_utils/transforms.py letterbox+normalize, YOLO
LetterBox at data/augment.py:1477 + predictor /255 at engine/predictor.py:116)
becomes ONE device pass: uint8 HWC frames stream HBM→VMEM once, are
nearest-resized, padded with 114 and scaled to [0,1] float — no host float
conversion (4x less PCIe/ICI traffic: bytes move as uint8) and no separate
pad/convert/normalize HBM round-trips.

Grid: one program per (image, output-row-tile). Each program gathers the
source rows it needs with dynamic slices and emits a (TILE_H, W_out, 3)
float tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _letterbox_kernel(src_ref, out_ref, *, h_in, w_in, h_out, w_out, tile_h, pad_value):
    """src_ref: (h_in, w_in, 3) uint8 VMEM; out_ref: (tile_h, w_out, 3) float32."""
    t = pl.program_id(1)
    row0 = t * tile_h

    gain = min(h_out / h_in, w_out / w_in)
    new_h = round(h_in * gain)
    new_w = round(w_in * gain)
    top = (h_out - new_h) // 2
    left = (w_out - new_w) // 2

    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_out), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_out), 1)
    # nearest source pixel, jax.image.resize convention: floor((i+0.5)·in/out)
    sy = ((rows - top).astype(jnp.float32) + 0.5) * (h_in / new_h)
    sx = ((cols - left).astype(jnp.float32) + 0.5) * (w_in / new_w)
    syi = jnp.clip(jnp.floor(sy), 0, h_in - 1).astype(jnp.int32)
    sxi = jnp.clip(jnp.floor(sx), 0, w_in - 1).astype(jnp.int32)
    inside = (rows >= top) & (rows < top + new_h) & (cols >= left) & (cols < left + new_w)

    src = src_ref[:].astype(jnp.float32)
    flat = src.reshape(h_in * w_in, 3)
    idx = syi * w_in + sxi  # (tile_h, w_out)
    gathered = jnp.take(flat, idx.reshape(-1), axis=0).reshape(tile_h, w_out, 3)
    out = jnp.where(inside[..., None], gathered, jnp.float32(pad_value))
    out_ref[:] = (out / 255.0).reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=("out_hw", "tile_h", "pad_value", "interpret"))
def letterbox_normalize(images_u8, out_hw=(640, 640), tile_h=64, pad_value=114, interpret=False):
    """Fused device preprocessing.

    Args:
        images_u8: (B, H, W, 3) uint8 batch (one source size per call —
            bucket mixed sizes on the host).
        out_hw: letterboxed output size (stride-aligned).

    Returns:
        (B, h_out, w_out, 3) float32 in [0, 1], padded with 114/255.
    """
    b, h_in, w_in, _ = images_u8.shape
    h_out, w_out = out_hw
    tile_h = min(tile_h, h_out)
    while h_out % tile_h:
        tile_h //= 2
    n_tiles = h_out // tile_h

    kernel = functools.partial(
        _letterbox_kernel,
        h_in=h_in, w_in=w_in, h_out=h_out, w_out=w_out, tile_h=tile_h, pad_value=pad_value,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, h_in, w_in, 3), lambda i, t: (i, 0, 0, 0), memory_space=pl.ANY)
        ],
        out_specs=pl.BlockSpec((1, tile_h, w_out, 3), lambda i, t: (i, t, 0, 0), memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, 3), jnp.float32),
        interpret=interpret,
    )(images_u8)


def letterbox_normalize_xla(images_u8, out_hw=(640, 640), pad_value=114):
    """XLA reference implementation (also the CPU fallback)."""
    b, h_in, w_in, _ = images_u8.shape
    h_out, w_out = out_hw
    gain = min(h_out / h_in, w_out / w_in)
    new_h, new_w = round(h_in * gain), round(w_in * gain)
    top, left = (h_out - new_h) // 2, (w_out - new_w) // 2
    resized = jax.image.resize(images_u8.astype(jnp.float32), (b, new_h, new_w, 3), "nearest")
    canvas = jnp.full((b, h_out, w_out, 3), float(pad_value), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, top, left, 0))
    return canvas / 255.0
