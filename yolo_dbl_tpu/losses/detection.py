"""YOLO detection loss: BCE classification + CIoU box + DFL.

TPU-native re-implementation of the reference's v8DetectionLoss
(utils/loss.py:157, BboxLoss at loss.py:91, DFLoss at loss.py:65). Padded
GTs + masks replace boolean indexing; the assigner runs under
stop_gradient like the reference's @torch.no_grad (tal.py:40).

Batch contract (from the data pipeline):
    img:      (B, H, W, 3)
    gt_boxes: (B, M, 4) normalized xywh, zero-padded
    gt_cls:   (B, M) int
    gt_mask:  (B, M) 1.0 for real boxes
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.heads import flatten_levels
from ..ops.anchors import bbox2dist, dist2bbox, make_anchors
from ..ops.boxes import bbox_iou, xywh2xyxy
from .tal import task_aligned_assign


class LossItems(NamedTuple):
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def _bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (torch BCEWithLogitsLoss, reduction=none)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _df_loss(pred_dist, target, reg_max=16):
    """Distribution-focal cross-entropy on the two adjacent integer bins
    (reference loss.py:65 DFLoss.__call__). pred_dist: (..., 4, reg_max),
    target: (..., 4) continuous distances. Returns (...,) mean over the 4 sides.

    Gather-free: the two-bin pick is an iota-compare one-hot contraction.
    take_along_axis on the 16-lane minor axis lowered as a real gather and
    cost 52.8 ms at b48@640 vs 0.63 ms for this form (84x — the single
    largest line item of the whole train step; tools/exp_loss_breakdown.py,
    real v5e, 2026-08-19). TPU gathers are scatter-class; iota-compare
    selections fuse into the surrounding elementwise graph.
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target)
    wl = tl + 1.0 - target
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    iota = jnp.arange(reg_max, dtype=target.dtype)
    oh_l = (iota == tl[..., None]).astype(logp.dtype)
    oh_r = (iota == jnp.minimum(tl + 1.0, reg_max - 1)[..., None]).astype(logp.dtype)
    ce_l = -(logp * oh_l).sum(-1)
    ce_r = -(logp * oh_r).sum(-1)
    return (ce_l * wl + ce_r * (1.0 - wl)).mean(axis=-1)


def detection_loss(
    feats: Sequence[jnp.ndarray],
    batch,
    strides: Tuple[int, ...],
    nc: int,
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    tal_topk: int = 10,
) -> Tuple[jnp.ndarray, LossItems]:
    """Compute the total detection loss from raw Detect maps.

    Mirrors reference v8DetectionLoss.__call__ (loss.py:206): targets are
    scaled to input pixels, predictions decoded in grid units, TAL assignment
    on stride-scaled boxes, gains box/cls/dfl = 7.5/0.5/1.5, total scaled by
    batch size.
    """
    b = feats[0].shape[0]
    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]
    shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_tensor = make_anchors(shapes, strides)  # (A,2), (A,1)

    x = flatten_levels(feats).astype(jnp.float32)  # (B, A, 4*reg_max+nc)
    pred_distri, pred_scores = x[..., : 4 * reg_max], x[..., 4 * reg_max :]

    # decode pred boxes in grid units
    pd = pred_distri.reshape(b, -1, 4, reg_max)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    dist = (jax.nn.softmax(pd, axis=-1) * proj).sum(-1)  # (B, A, 4)
    pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)  # xyxy, grid units

    # targets → input pixels, xyxy
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], dtype=jnp.float32)
    gt_bboxes = xywh2xyxy(batch["gt_boxes"].astype(jnp.float32) * scale)  # (B, M, 4)
    gt_labels = batch["gt_cls"].astype(jnp.int32)
    mask_gt = batch["gt_mask"].astype(jnp.float32)
    # degenerate (zero-area) padded boxes are already masked by gt_mask

    _, target_bboxes, target_scores, fg_mask, _ = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        gt_labels,
        gt_bboxes,
        mask_gt,
        topk=tal_topk,
        num_classes=nc,
    )
    target_scores = jax.lax.stop_gradient(target_scores)
    target_bboxes = jax.lax.stop_gradient(target_bboxes) / stride_tensor[None]
    fg = jax.lax.stop_gradient(fg_mask).astype(jnp.float32)

    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    # classification BCE over all anchors
    loss_cls = _bce_with_logits(pred_scores, target_scores).sum() / target_scores_sum

    # box CIoU on foreground, weighted by soft target score
    weight = target_scores.sum(-1) * fg  # (B, A)
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True)  # (B, A)
    loss_box = ((1.0 - iou) * weight).sum() / target_scores_sum

    # DFL on foreground
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max)  # clamps to reg_max-0.01
    target_ltrb = jnp.clip(target_ltrb, 0, reg_max - 1 - 0.01)
    dfl = _df_loss(pd, target_ltrb, reg_max)  # (B, A)
    loss_dfl = (dfl * weight).sum() / target_scores_sum

    items = LossItems(box=loss_box * box_gain, cls=loss_cls * cls_gain, dfl=loss_dfl * dfl_gain)
    total = (items.box + items.cls + items.dfl) * b
    return total, items
