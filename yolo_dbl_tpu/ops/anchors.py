"""Anchor-free grid anchors and distance<->box codecs.

JAX equivalents of the reference's utils/tal.py:333 (make_anchors),
tal.py:348 (dist2bbox) and tal.py:360 (bbox2dist). Anchors are computed
from static feature shapes, so everything folds into the jitted graph.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_anchors(feat_shapes, strides, grid_cell_offset=0.5, dtype=jnp.float32):
    """Build anchor center points for a list of feature map shapes.

    Args:
        feat_shapes: list of (h, w) ints per detection level.
        strides: list of stride ints per level.
        grid_cell_offset: cell-center offset (0.5 = cell centers).

    Returns:
        anchor_points: (A, 2) xy centers in feature-grid units.
        stride_tensor: (A, 1) per-anchor stride.
    """
    anchor_points, stride_tensor = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance, anchor_points, xywh=True, axis=-1):
    """Decode (l, t, r, b) distances from anchor points into boxes."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points, bbox, reg_max):
    """Encode xyxy boxes as clamped (l, t, r, b) distances for DFL targets."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(dist, 0, reg_max - 0.01)


def dist2rbox(pred_dist, pred_angle, anchor_points):
    """Decode DFL distances + angle to rotated xywh boxes (reference
    tal.py:366 dist2rbox): the ltrb offset is rotated into the box frame."""
    lt, rb = pred_dist[..., :2], pred_dist[..., 2:]
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf = (rb[..., :1] - lt[..., :1]) / 2
    yf = (rb[..., 1:] - lt[..., 1:]) / 2
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], -1) + anchor_points
    return jnp.concatenate([xy, lt + rb], -1)
