"""Task losses beyond plain detection.

Reference parity (utils/loss.py): E2EDetectLoss (:728 — one2many TAL top-10
+ one2one TAL top-1 for v10Detect), v8ClassificationLoss (:263+ CE),
v8SegmentationLoss (mask BCE on cropped instance masks, normalized by box
area), v8PoseLoss (keypoint location OKS-style + visibility BCE), and the
probiou rotated-box similarity (utils/metrics.py:198) used by v8OBBLoss.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn.heads import flatten_levels
from ..ops.anchors import make_anchors
from .detection import LossItems, _bce_with_logits, detection_loss


def e2e_detect_loss(feats_dict: Dict, batch, strides, nc, **kw):
    """v10 end-to-end loss (reference loss.py:728 E2EDetectLoss):
    one2many branch with TAL top-10 + one2one branch with TAL top-1."""
    l_many, items_many = detection_loss(feats_dict["one2many"], batch, strides, nc, tal_topk=10, **kw)
    l_one, items_one = detection_loss(feats_dict["one2one"], batch, strides, nc, tal_topk=1, **kw)
    total = l_many + l_one
    return total, {"one2many": items_many, "one2one": items_one}


def classification_loss(logits, labels, label_smoothing: float = 0.0):
    """Cross-entropy classification loss (reference v8ClassificationLoss)."""
    nc = logits.shape[-1]
    targets = jax.nn.one_hot(labels, nc)
    if label_smoothing:
        targets = targets * (1 - label_smoothing) + label_smoothing / nc
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -(targets * logp).sum(-1).mean()


def crop_mask_loss(pred_masks, gt_masks, boxes_xyxy_mask_space, fg_weight, eps=1e-6):
    """Per-instance mask BCE, cropped to the GT box and normalized by box
    area (reference v8SegmentationLoss.single_mask_loss).

    pred_masks/gt_masks: (N, Hm, Wm) logits / {0,1}; boxes in mask coords.
    fg_weight: (N,) selection weights (0 for padding rows).
    """
    n, hm, wm = pred_masks.shape
    ce = _bce_with_logits(pred_masks, gt_masks)  # (N, Hm, Wm)
    cols = jnp.arange(wm)[None, None, :]
    rows = jnp.arange(hm)[None, :, None]
    x1, y1, x2, y2 = (boxes_xyxy_mask_space[:, i][:, None, None] for i in range(4))
    inside = (cols >= x1) & (cols < x2) & (rows >= y1) & (rows < y2)
    area = jnp.clip((x2 - x1) * (y2 - y1), 1.0)[:, 0, 0]
    per = (ce * inside).sum(axis=(1, 2)) / area
    return (per * fg_weight).sum() / jnp.maximum(fg_weight.sum(), 1.0)


# COCO-17 keypoint sigmas (reference v8PoseLoss / KeypointLoss, loss.py:140).
# numpy, not jnp: module-level jnp.array forces backend init at import time.
import numpy as _np

OKS_SIGMA = _np.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89],
    _np.float32,
) / 10.0


def keypoint_loss(pred_kpts, gt_kpts, kpt_mask, area, sigmas=None):
    """OKS-style keypoint location loss (reference loss.py:140 KeypointLoss).

    pred_kpts/gt_kpts: (N, K, 2); kpt_mask: (N, K) visibility; area (N,).
    """
    n, k, _ = pred_kpts.shape
    sig = sigmas if sigmas is not None else (OKS_SIGMA if k == 17 else jnp.full((k,), 1.0 / k))
    d2 = ((pred_kpts - gt_kpts) ** 2).sum(-1)  # (N, K)
    kpt_loss_factor = k / (jnp.maximum(kpt_mask.sum(-1, keepdims=True), 1.0))
    e = d2 / (2 * sig[None] ** 2) / jnp.clip(area[:, None], 1e-9) / 2
    loss = (kpt_loss_factor * (1 - jnp.exp(-e)) * kpt_mask).sum(-1)
    denom = jnp.maximum((kpt_mask.sum(-1) > 0).sum(), 1.0)
    return loss.sum() / denom


def probiou(obb1, obb2, eps=1e-7):
    """Probabilistic IoU between rotated boxes (reference utils/metrics.py:198).

    obb: (..., 5) = (cx, cy, w, h, angle). Returns (...,) similarity in [0, 1].
    """
    x1, y1, w1, h1, r1 = (obb1[..., i] for i in range(5))
    x2, y2, w2, h2, r2 = (obb2[..., i] for i in range(5))

    def cov(w, h, r):
        a = (w**2 / 12) * jnp.cos(r) ** 2 + (h**2 / 12) * jnp.sin(r) ** 2
        b = (w**2 / 12) * jnp.sin(r) ** 2 + (h**2 / 12) * jnp.cos(r) ** 2
        c = ((w**2 - h**2) / 12) * jnp.cos(r) * jnp.sin(r)
        return a, b, c

    a1, b1, c1 = cov(w1, h1, r1)
    a2, b2, c2 = cov(w2, h2, r2)
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / (
        (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    ) * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps) * 0.5
    t3 = jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0) * jnp.clip(a2 * b2 - c2**2, 0)) + eps)
        + eps
    ) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1.0 - hd


def varifocal_loss(pred_logits, gt_score, label, alpha=0.75, gamma=2.0):
    """Varifocal loss (reference loss.py:16)."""
    pred_sig = jax.nn.sigmoid(pred_logits)
    weight = alpha * pred_sig**gamma * (1 - label) + gt_score * label
    return (_bce_with_logits(pred_logits, gt_score) * weight).sum()


def focal_loss(pred_logits, label, alpha=0.25, gamma=1.5):
    """Focal loss (reference loss.py:40)."""
    p = jax.nn.sigmoid(pred_logits)
    ce = _bce_with_logits(pred_logits, label)
    p_t = label * p + (1 - label) * (1 - p)
    mod = (1.0 - p_t) ** gamma
    if alpha > 0:
        a_t = label * alpha + (1 - label) * (1 - alpha)
        mod = mod * a_t
    return (ce * mod).sum()


def exclusive_instance_masks(gm):
    """Resolve overlapping instance masks to exclusive pixel ownership.

    Reference overlap_mask=True (Format(mask_overlap) + polygons2masks_overlap,
    data/utils.py): instances are rendered largest-first into ONE index mask,
    so a pixel covered by several instances belongs to the SMALLEST one.
    Equivalent per-instance form: each instance gets a priority = its rank in
    descending-area order and keeps only pixels where it holds the max
    priority. gm: (B, M, Hm, Wm) binary; padded all-zero rows are unaffected.
    """
    areas = gm.sum((-1, -2))  # (B, M)
    rank = jnp.argsort(jnp.argsort(-areas, axis=1), axis=1).astype(jnp.float32)
    pri = (rank + 1.0) * (areas > 0)  # padded rows drop out
    pri_m = gm * pri[:, :, None, None]
    return gm * (pri_m == pri_m.max(axis=1, keepdims=True))


def segmentation_loss(feats, coeffs, protos, batch, strides, nc, overlap_masks=True, **kw):
    """Detection loss + prototype mask loss (reference v8SegmentationLoss).

    batch additionally carries gt_masks (B, M, Hm, Wm) binary instance masks
    aligned to the prototype resolution. The TAL assignment is recomputed
    here to recover per-anchor GT indices for the coefficient supervision.
    """
    from ..ops.boxes import xywh2xyxy
    from .tal import task_aligned_assign

    total_det, items = detection_loss(feats, batch, strides, nc, **kw)

    b = feats[0].shape[0]
    shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_t = make_anchors(shapes, strides)
    x = flatten_levels(feats).astype(jnp.float32)
    pred_scores = x[..., 64:]
    imgsz = feats[0].shape[1] * strides[0]
    gt_xyxy = xywh2xyxy(batch["gt_boxes"].astype(jnp.float32)) * imgsz
    from ..ops.anchors import dist2bbox
    from ..nn.heads import dfl_expectation

    dist = dfl_expectation(x[..., :64], 16)
    pd_boxes = dist2bbox(dist, anchor_points[None], xywh=False) * stride_t[None]
    _, tgt_boxes, tgt_scores, fg_mask, tgt_idx = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pd_boxes),
        anchor_points * stride_t,
        batch["gt_cls"].astype(jnp.int32),
        gt_xyxy,
        batch["gt_mask"].astype(jnp.float32),
        num_classes=nc,
    )
    coeff_flat = flatten_levels(coeffs).astype(jnp.float32)  # (B, A, nm)
    hm, wm = protos.shape[1:3]
    # per-anchor predicted masks for assigned GTs
    pred_m = jnp.einsum("bak,bhwk->bahw", coeff_flat, protos.astype(jnp.float32))  # (B, A, Hm, Wm)
    gm = batch["gt_masks"].astype(jnp.float32)  # (B, M, Hm, Wm) per-instance
    if overlap_masks:
        gm = exclusive_instance_masks(gm)
    gt_m = jnp.take_along_axis(gm, tgt_idx[:, :, None, None], axis=1)  # (B, A, Hm, Wm)
    scale = jnp.array([wm, hm, wm, hm], jnp.float32) / imgsz
    boxes_m = tgt_boxes * scale
    fg = fg_mask.astype(jnp.float32)
    loss_mask = crop_mask_loss(
        pred_m.reshape(-1, hm, wm), gt_m.reshape(-1, hm, wm), boxes_m.reshape(-1, 4), fg.reshape(-1)
    )
    total = total_det + loss_mask * b
    return total, {**items._asdict(), "mask": loss_mask}


def kpts_decode(anchor_points, pred_kpts):
    """Decode raw keypoint maps to grid coordinates (reference loss.py:526):
    xy = raw_xy * 2 + (anchor - 0.5); visibility channel passes through."""
    xy = pred_kpts[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
    return jnp.concatenate([xy, pred_kpts[..., 2:]], axis=-1)


def pose_loss(feats, kpt_maps, batch, strides, nc, kpt_shape=(17, 3),
              pose_gain=12.0, kobj_gain=1.0, **kw):
    """Detection loss + OKS keypoint location + visibility BCE
    (reference v8PoseLoss, loss.py:446). Fixed shapes: batch carries
    gt_kpts (B, M, K, nd) with xy normalized to [0, 1].
    """
    from ..nn.heads import dfl_expectation
    from ..ops.anchors import dist2bbox
    from ..ops.boxes import xywh2xyxy
    from .tal import task_aligned_assign

    total_det, items = detection_loss(feats, batch, strides, nc, **kw)

    b = feats[0].shape[0]
    nk, nd = kpt_shape
    shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_t = make_anchors(shapes, strides)
    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]

    x = flatten_levels(feats).astype(jnp.float32)
    pred_scores = x[..., 64:]
    dist = dfl_expectation(x[..., :64], 16)
    pd_boxes = dist2bbox(dist, anchor_points[None], xywh=False)  # grid units

    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_xyxy = xywh2xyxy(batch["gt_boxes"].astype(jnp.float32) * scale)
    _, tgt_boxes, _, fg_mask, tgt_idx = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pd_boxes * stride_t[None]),
        anchor_points * stride_t,
        batch["gt_cls"].astype(jnp.int32),
        gt_xyxy,
        batch["gt_mask"].astype(jnp.float32),
        num_classes=nc,
    )
    fg = jax.lax.stop_gradient(fg_mask).astype(jnp.float32)
    tgt_boxes = jax.lax.stop_gradient(tgt_boxes) / stride_t[None]  # grid units

    # predicted keypoints in grid units
    pk = flatten_levels(kpt_maps).astype(jnp.float32).reshape(b, -1, nk, nd)
    pred_kpts = kpts_decode(anchor_points, pk)

    # assigned GT keypoints, pixels -> per-anchor grid units
    gk = jnp.asarray(batch["gt_kpts"], jnp.float32)  # (B, M, K, nd), xy in [0, 1]
    kscale = jnp.concatenate(
        [jnp.array([imgsz_w, imgsz_h], jnp.float32), jnp.ones((nd - 2,), jnp.float32)])
    gk = gk * kscale
    sel = jnp.take_along_axis(gk, tgt_idx[:, :, None, None], axis=1)  # (B, A, K, nd)
    kdiv = jnp.concatenate([stride_t[None, :, :, None] * jnp.ones((1, 1, 1, 2)),
                            jnp.ones((1, sel.shape[1], 1, nd - 2))], axis=-1)
    sel = sel / kdiv

    area = jnp.clip((tgt_boxes[..., 2] - tgt_boxes[..., 0])
                    * (tgt_boxes[..., 3] - tgt_boxes[..., 1]), 0)  # (B, A)
    kpt_mask = (sel[..., 2] != 0).astype(jnp.float32) if nd == 3 else jnp.ones(sel.shape[:-1])
    sig = OKS_SIGMA if nk == 17 else jnp.full((nk,), 1.0 / nk)
    d2 = ((pred_kpts[..., :2] - sel[..., :2]) ** 2).sum(-1)  # (B, A, K)
    factor = nk / (kpt_mask.sum(-1, keepdims=True) + 1e-9)
    e = d2 / ((2 * sig[None, None]) ** 2 * (area[..., None] + 1e-9) * 2)
    per_elem = factor * (1 - jnp.exp(-e)) * kpt_mask  # (B, A, K)
    n_fg = jnp.maximum(fg.sum(), 1.0)
    loss_kpt = (per_elem * fg[..., None]).sum() / (n_fg * nk)

    if nd == 3:
        kobj = _bce_with_logits(pk[..., 2], kpt_mask)  # raw logit channel
        loss_kobj = (kobj * fg[..., None]).sum() / (n_fg * nk)
    else:
        loss_kobj = jnp.zeros(())

    total = total_det + (loss_kpt * pose_gain + loss_kobj * kobj_gain) * b
    return total, {**items._asdict(), "kpt": loss_kpt * pose_gain, "kobj": loss_kobj * kobj_gain}


from ..ops.anchors import dist2rbox  # re-export (moved to ops for head decode)


def obb_loss(feats, angle_maps, batch, strides, nc, reg_max=16,
             box_gain=7.5, cls_gain=0.5, dfl_gain=1.5):
    """Rotated detection loss (reference v8OBBLoss, loss.py:612): probiou box
    loss + BCE cls + DFL, with the rotated TAL assigner. batch["gt_boxes"] is
    (B, M, 5) xywhr with xywh normalized to [0, 1], angle in radians.
    """
    from ..nn.heads import dfl_expectation
    from ..ops.anchors import bbox2dist
    from ..ops.boxes import xywh2xyxy
    from .detection import _df_loss
    from .tal import rotated_task_aligned_assign

    b = feats[0].shape[0]
    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]
    shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_t = make_anchors(shapes, strides)

    x = flatten_levels(feats).astype(jnp.float32)
    pred_distri, pred_scores = x[..., : 4 * reg_max], x[..., 4 * reg_max:]
    pred_angle = flatten_levels(angle_maps).astype(jnp.float32)  # (B, A, 1)

    pd = pred_distri.reshape(b, -1, 4, reg_max)
    dist = dfl_expectation(pred_distri, reg_max)
    pred_rboxes = jnp.concatenate(
        [dist2rbox(dist, pred_angle, anchor_points[None]), pred_angle], -1)  # (B, A, 5) grid units

    gt = batch["gt_boxes"].astype(jnp.float32)  # (B, M, 5) normalized xywh + r
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_rboxes = jnp.concatenate([gt[..., :4] * scale, gt[..., 4:5]], -1)
    # filter tiny rboxes (<2 px) like the reference (loss.py:660)
    size_ok = (gt_rboxes[..., 2] >= 2) & (gt_rboxes[..., 3] >= 2)
    mask_gt = batch["gt_mask"].astype(jnp.float32) * size_ok.astype(jnp.float32)

    assign_boxes = pred_rboxes.at[..., :4].multiply(stride_t[None])
    _, tgt_rboxes, tgt_scores, fg_mask, _ = rotated_task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(assign_boxes),
        anchor_points * stride_t,
        batch["gt_cls"].astype(jnp.int32),
        gt_rboxes,
        mask_gt,
        num_classes=nc,
    )
    tgt_scores = jax.lax.stop_gradient(tgt_scores)
    tgt_rboxes = jax.lax.stop_gradient(tgt_rboxes).at[..., :4].divide(stride_t[None])
    fg = jax.lax.stop_gradient(fg_mask).astype(jnp.float32)
    tss = jnp.maximum(tgt_scores.sum(), 1.0)

    loss_cls = _bce_with_logits(pred_scores, tgt_scores).sum() / tss

    weight = tgt_scores.sum(-1) * fg
    iou = jnp.clip(probiou(pred_rboxes, tgt_rboxes), 0.0)
    loss_box = ((1.0 - iou) * weight).sum() / tss

    # DFL against the axis-aligned version of the target (loss.py:131)
    tgt_ltrb = bbox2dist(anchor_points[None], xywh2xyxy(tgt_rboxes[..., :4]), reg_max)
    tgt_ltrb = jnp.clip(tgt_ltrb, 0, reg_max - 1 - 0.01)
    dfl = _df_loss(pd, tgt_ltrb, reg_max)
    loss_dfl = (dfl * weight).sum() / tss

    items = LossItems(box=loss_box * box_gain, cls=loss_cls * cls_gain, dfl=loss_dfl * dfl_gain)
    total = (items.box + items.cls + items.dfl) * b
    return total, items
