"""Fast R-CNN (NHWC, flax) — RoIAlign on stride-32 ResNet features.

Equivalent of the reference's single-stage-trained Fast R-CNN
(models/Fast-RCNN/model.py:6 FastRCNN, :41 FastRCNNFPN) with its proposal
strategy (utils.py:6 GT-positives + random-box negatives — no selective
search) and target computation (utils.py:48, BBOX_REG_STDS (0.1,0.1,0.2,0.2),
background = LAST class index). Host-side proposal/target generation lives
here as numpy functions mirroring the reference's collator.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import xyxy2xywh
from ..ops.nms import non_max_suppression
from ..ops.roi_align import multiscale_roi_align, roi_align
from .backbones import FPN, ResNet50

Dtype = Any

BBOX_REG_STDS = np.array([0.1, 0.1, 0.2, 0.2], np.float32)


class FastRCNN(nn.Module):
    """ResNet-50 stride-32 backbone + RoIAlign 7×7 + 1024-d head
    (reference model.py:6). Returns (scores[K, nc+1], deltas[K, 4])."""

    num_classes: int  # foreground + 1 background (background = last index)
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, rois, train: bool = False):
        feats = ResNet50(dtype=self.dtype, name="backbone")(images, train)["layer4"]
        pooled = roi_align(feats, rois, (7, 7), spatial_scale=1.0 / 32.0,
                           sampling_ratio=-1, aligned=True)
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc2")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


class FastRCNNFPN(nn.Module):
    """FPN variant with MultiScaleRoIAlign + BN head (reference model.py:41)."""

    num_classes: int
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, rois, train: bool = False):
        feats = ResNet50(dtype=self.dtype, name="backbone")(images, train)
        pyramid = FPN(dtype=self.dtype, name="fpn")(feats, train)
        pooled = multiscale_roi_align(pyramid, rois, images.shape[1])
        x = pooled.reshape(pooled.shape[0], -1)
        for i in (1, 2):
            x = nn.Dense(1024, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


def make_train_proposals(gt_boxes, img_size, num_samples=64, pos_fraction=0.25,
                         neg_iou_thresh=0.3, rng=None):
    """GT-as-positives + random negatives (reference utils.py:6), numpy host-side."""
    rng = rng or np.random.default_rng()
    num_pos = int(num_samples * pos_fraction)
    pos = gt_boxes[:num_pos] if len(gt_boxes) > num_pos else gt_boxes
    n_cand = (num_samples - len(pos)) * 5
    raw = rng.uniform(0, img_size, (n_cand, 4)).astype(np.float32)
    x1y1 = np.minimum(raw[:, :2], raw[:, 2:])
    x2y2 = np.maximum(raw[:, :2], raw[:, 2:])
    cand = np.concatenate([x1y1, x2y2], axis=1)
    if len(gt_boxes):
        from ..utils.metrics import box_iou_np

        max_iou = box_iou_np(cand, gt_boxes).max(axis=1)
    else:
        max_iou = np.zeros(len(cand))
    neg = cand[max_iou < neg_iou_thresh][: num_samples - len(pos)]
    short = num_samples - len(pos) - len(neg)
    if short > 0 and len(neg):
        neg = np.concatenate([neg, neg[rng.integers(0, len(neg), short)]])
    return np.concatenate([pos, neg]) if len(pos) or len(neg) else np.zeros((0, 4), np.float32)


def compute_targets(proposals, gt_boxes, gt_labels, pos_iou_thresh=0.5, num_classes=4):
    """Labels + normalized deltas (reference utils.py:48; background = nc-1)."""
    if len(proposals) == 0:
        return np.zeros((0,), np.int64), np.zeros((0, 4), np.float32)
    if len(gt_boxes) == 0:
        return np.full(len(proposals), num_classes - 1, np.int64), np.zeros((len(proposals), 4), np.float32)
    from ..utils.metrics import box_iou_np

    iou = box_iou_np(proposals, gt_boxes)
    max_iou = iou.max(axis=1)
    best = iou.argmax(axis=1)
    labels = gt_labels[best].astype(np.int64)
    labels[max_iou < pos_iou_thresh] = num_classes - 1
    gm = gt_boxes[best]
    pw = np.clip(proposals[:, 2] - proposals[:, 0], 1e-6, None)
    ph = np.clip(proposals[:, 3] - proposals[:, 1], 1e-6, None)
    px = (proposals[:, 0] + proposals[:, 2]) / 2
    py = (proposals[:, 1] + proposals[:, 3]) / 2
    gw = np.clip(gm[:, 2] - gm[:, 0], 1e-6, None)
    gh = np.clip(gm[:, 3] - gm[:, 1], 1e-6, None)
    gx = (gm[:, 0] + gm[:, 2]) / 2
    gy = (gm[:, 1] + gm[:, 3]) / 2
    t = np.stack([(gx - px) / pw, (gy - py) / ph, np.log(gw / pw), np.log(gh / ph)], axis=1)
    return labels, (t / BBOX_REG_STDS).astype(np.float32)


def apply_regression(boxes, deltas):
    """Decode class-agnostic deltas onto proposals (reference utils.py:124)."""
    pw = jnp.clip(boxes[:, 2] - boxes[:, 0], 1e-6)
    ph = jnp.clip(boxes[:, 3] - boxes[:, 1], 1e-6)
    px = (boxes[:, 0] + boxes[:, 2]) / 2
    py = (boxes[:, 1] + boxes[:, 3]) / 2
    d = deltas * jnp.asarray(BBOX_REG_STDS)
    cx = px + d[:, 0] * pw
    cy = py + d[:, 1] * ph
    w = pw * jnp.exp(d[:, 2])
    h = ph * jnp.exp(d[:, 3])
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


def fast_rcnn_loss(scores, deltas, labels, reg_targets, num_classes):
    """CE over all rois + smooth-L1 on foreground (background = last class)."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    loss_cls = ce.mean()
    fg = (labels < num_classes - 1).astype(jnp.float32)
    diff = deltas - reg_targets
    l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2, jnp.abs(diff) - 0.5).sum(-1)
    loss_reg = (l1 * fg).sum() / jnp.maximum(fg.sum(), 1.0)
    return loss_cls + loss_reg, {"loss_cls": loss_cls, "loss_reg": loss_reg}


def fast_rcnn_detect(scores, deltas, rois, num_classes, img_size,
                     conf=0.25, iou=0.45, max_det=100):
    """Per-image decode + per-class NMS. rois: (K, 5); batch of 1 assumed
    (mirrors reference detect flow)."""
    probs = jax.nn.softmax(scores, axis=-1)[:, : num_classes - 1]  # drop background (last)
    boxes = apply_regression(rois[:, 1:], deltas)
    boxes = jnp.clip(boxes, 0, img_size)
    pred = jnp.concatenate([xyxy2xywh(boxes), probs], axis=-1)[None]
    return non_max_suppression(pred, conf_thres=conf, iou_thres=iou, max_det=max_det, in_format="a_no")
