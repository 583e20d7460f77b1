"""Box geometry ops: format conversion and IoU families.

TPU-native JAX equivalents of the reference's box utilities
(reference: models/YOLO/ultralytics/utils/ops.py:319-460 converters,
utils/metrics.py:74 bbox_iou). Everything is fixed-shape, vmappable and
jit-friendly; boxes are (..., 4) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xyxy2ltwh(x):
    """(x1, y1, x2, y2) -> (x1, y1, w, h) — COCO json format."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def ltwh2xyxy(x):
    x1, y1, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([x1, y1, x1 + w, y1 + h], axis=-1)


def box_area(box):
    """Area of (..., 4) xyxy boxes."""
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def box_iou(box1, box2, eps=1e-7):
    """Pairwise IoU between (..., N, 4) and (..., M, 4) xyxy boxes -> (..., N, M).

    The x/y planes are computed as separate (..., N, M) arrays rather than a
    stacked (..., N, M, 2): a trailing dim of 2 is a pathological TPU layout
    that forced XLA to materialize the full f32 [K, K, 2] intermediate
    (1.07 GB at B=128, K=1024 — measured ~17% of NMS traffic in the b128
    traffic map). Same ops in the same order, so results are bitwise
    identical. Exactly symmetric in (box1, box2) when called with the same
    array (min/max/add are commutative), which _suppress relies on.
    """
    b1x1, b1y1 = box1[..., :, None, 0], box1[..., :, None, 1]
    b1x2, b1y2 = box1[..., :, None, 2], box1[..., :, None, 3]
    b2x1, b2y1 = box2[..., None, :, 0], box2[..., None, :, 1]
    b2x2, b2y2 = box2[..., None, :, 2], box2[..., None, :, 3]
    iw = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0.0)
    ih = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0.0)
    inter = iw * ih
    area1 = (b1x2 - b1x1) * (b1y2 - b1y1)
    area2 = (b2x2 - b2x1) * (b2y2 - b2y1)
    return inter / (area1 + area2 - inter + eps)


def bbox_iou(box1, box2, xywh=True, GIoU=False, DIoU=False, CIoU=False, eps=1e-7):
    """Elementwise IoU/GIoU/DIoU/CIoU between broadcastable (..., 4) boxes.

    Mirrors the reference semantics (utils/metrics.py:74): xywh inputs by
    default; CIoU adds the aspect-ratio penalty with an alpha term treated as
    a constant w.r.t. gradients (the reference computes alpha under no_grad).
    Returns (...,) array (the trailing dim-4 is consumed).
    """
    if xywh:
        x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
        x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
        w1_, h1_, w2_, h2_ = w1 / 2, h1 / 2, w2 / 2, h2 / 2
        b1x1, b1x2, b1y1, b1y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2x1, b2x2, b2y1, b2y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
    else:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1x2 - b1x1, (b1y2 - b1y1) + eps
        w2, h2 = b2x2 - b2x1, (b2y2 - b2y1) + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0.0) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0.0
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # convex width
        ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # convex height
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
            if CIoU:
                import jax

                v = (4 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                out = iou - (rho2 / c2 + v * alpha)
            else:
                out = iou - rho2 / c2
        else:
            c_area = cw * ch + eps
            out = iou - (c_area - union) / c_area
    else:
        out = iou
    return out.squeeze(-1)


def clip_boxes(boxes, shape_hw):
    """Clip xyxy boxes to image bounds (h, w)."""
    h, w = shape_hw
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding=True):
    """Rescale xyxy boxes from letterboxed img1 (h, w) back to original img0 (h, w).

    Mirrors reference utils/ops.py:92 (gain = min ratio, centered padding).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
            round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1),
        )
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    if padding:
        boxes = boxes - jnp.array([pad[0], pad[1], pad[0], pad[1]], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


def xywhr2xyxyxyxy(rboxes):
    """Rotated (cx, cy, w, h, angle) boxes → 4 corner points
    (reference utils/ops.py xywhr2xyxyxyxy). rboxes (..., 5) → (..., 4, 2)."""
    ctr = rboxes[..., :2]
    w, h, angle = rboxes[..., 2:3], rboxes[..., 3:4], rboxes[..., 4:5]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    vec1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], axis=-1)
    vec2 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], axis=-1)
    pt1 = ctr + vec1 + vec2
    pt2 = ctr + vec1 - vec2
    pt3 = ctr - vec1 - vec2
    pt4 = ctr - vec1 + vec2
    return jnp.stack([pt1, pt2, pt3, pt4], axis=-2)
