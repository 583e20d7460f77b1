"""Classic R-CNN (NHWC, flax) — selective-search crops through a classifier.

Equivalent of the reference's R-CNN (models/RCNN/model.py:6: frozen-ish
ResNet-50 feature extractor + global avgpool + 1024-d classifier (nc+1,
background = class 0 after +1 shift) + per-class bbox regressor), with the
offline preprocessing pipeline (preprocess.py:12) re-created on top of this
framework's selective-search implementation (data/proposals.py) and the
batched crop-inference + per-class NMS detect flow (detect.py:10).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import cv2
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data.proposals import create_training_samples, selective_search
from ..ops.boxes import xyxy2xywh
from ..ops.nms import non_max_suppression
from .backbones import ResNet50

Dtype = Any


class RCNN(nn.Module):
    """Crop classifier + bbox regressor (reference model.py:6)."""

    num_classes: int  # foreground classes; heads emit nc+1 / nc*4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet50(dtype=self.dtype, name="feature_extractor")(x, train)["layer4"]
        f = feats.mean(axis=(1, 2))  # adaptive avg pool to 1x1
        y = nn.relu(nn.Dense(1024, dtype=self.dtype, name="cls_fc1")(f))
        y = nn.Dropout(0.5, deterministic=not train)(y)
        y = nn.relu(nn.Dense(1024, dtype=self.dtype, name="cls_fc2")(y))
        y = nn.Dropout(0.5, deterministic=not train)(y)
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls_out")(y)
        r = nn.relu(nn.Dense(1024, dtype=self.dtype, name="reg_fc1")(f))
        r = nn.relu(nn.Dense(1024, dtype=self.dtype, name="reg_fc2")(r))
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="reg_out")(r)
        return scores, deltas


def preprocess_image(image: np.ndarray, gt_boxes: np.ndarray, gt_labels: np.ndarray,
                     max_proposals: int = 2000) -> Dict:
    """Offline sample generation for one image (reference preprocess.py:47
    worker): selective search → IoU-based pos/neg split + regression targets."""
    rects = selective_search(image, max_proposals=max_proposals)  # xywh
    proposals = np.stack(
        [rects[:, 0], rects[:, 1], rects[:, 0] + rects[:, 2], rects[:, 1] + rects[:, 3]], axis=1
    ) if len(rects) else np.zeros((0, 4), np.float32)
    pos, neg, labels, targets = create_training_samples(proposals, gt_boxes, gt_labels)
    return {
        "positive_rois": pos, "negative_rois": neg,
        "positive_labels": labels, "regression_targets": targets,
    }


def crop_batch(image: np.ndarray, boxes: np.ndarray, crop_size: int = 224) -> np.ndarray:
    """Extract + resize crops (host side), normalized to [0,1] float."""
    crops = np.zeros((len(boxes), crop_size, crop_size, 3), np.float32)
    h, w = image.shape[:2]
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(w, max(x2, x1 + 1)), min(h, max(y2, y1 + 1))
        crop = image[y1:y2, x1:x2]
        crops[i] = cv2.resize(crop, (crop_size, crop_size)).astype(np.float32) / 255.0
    return crops


def rcnn_loss(scores, deltas, labels, reg_targets, num_classes):
    """CE on all crops + smooth-L1 on positives' own class deltas
    (reference train.py:123: background label 0)."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    loss_cls = ce.mean()
    fg = labels > 0
    cls_idx = jnp.clip(labels - 1, 0, num_classes - 1)
    d = deltas.reshape(-1, num_classes, 4)
    d_sel = jnp.take_along_axis(d, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    diff = d_sel - reg_targets
    l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2, jnp.abs(diff) - 0.5).sum(-1)
    loss_reg = (l1 * fg).sum() / jnp.maximum(fg.sum(), 1.0)
    return loss_cls + loss_reg, {"loss_cls": loss_cls, "loss_reg": loss_reg}


def rcnn_detect(module, variables, image: np.ndarray, num_classes: int,
                conf=0.5, iou=0.3, max_det=100, crop_size=224, batch=128,
                max_proposals=2000) -> Tuple[np.ndarray, int]:
    """Full R-CNN inference on one image (reference detect.py:10): selective
    search → crop batches → classifier → per-class regression → NMS."""
    rects = selective_search(image, max_proposals=max_proposals)
    if len(rects) == 0:
        return np.zeros((0, 6)), 0
    boxes = np.stack(
        [rects[:, 0], rects[:, 1], rects[:, 0] + rects[:, 2], rects[:, 1] + rects[:, 3]], axis=1
    )
    all_scores, all_deltas = [], []
    infer = jax.jit(lambda v, x: module.apply(v, x))
    for s in range(0, len(boxes), batch):
        chunk = crop_batch(image, boxes[s : s + batch], crop_size)
        if len(chunk) < batch:  # pad to fixed batch for one compilation
            chunk = np.concatenate([chunk, np.zeros((batch - len(chunk), crop_size, crop_size, 3), np.float32)])
        sc, dl = infer(variables, jnp.asarray(chunk))
        all_scores.append(np.asarray(sc))
        all_deltas.append(np.asarray(dl))
    scores = np.concatenate(all_scores)[: len(boxes)]
    deltas = np.concatenate(all_deltas)[: len(boxes)]

    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    best_cls = np.asarray(probs[:, 1:].argmax(axis=-1))
    d = deltas.reshape(-1, num_classes, 4)[np.arange(len(boxes)), best_cls]
    pw = np.clip(boxes[:, 2] - boxes[:, 0], 1e-6, None)
    ph = np.clip(boxes[:, 3] - boxes[:, 1], 1e-6, None)
    px = (boxes[:, 0] + boxes[:, 2]) / 2
    py = (boxes[:, 1] + boxes[:, 3]) / 2
    cx = px + d[:, 0] * pw
    cy = py + d[:, 1] * ph
    w = pw * np.exp(np.clip(d[:, 2], -4, 4))
    h = ph * np.exp(np.clip(d[:, 3], -4, 4))
    refined = np.stack([cx, cy, w, h], axis=1)
    cls_scores = np.zeros((len(boxes), num_classes), np.float32)
    cls_scores[np.arange(len(boxes)), best_cls] = np.asarray(probs[:, 1:].max(axis=-1))
    pred = jnp.asarray(np.concatenate([refined, cls_scores], axis=1))[None]
    dets, num = non_max_suppression(pred, conf_thres=conf, iou_thres=iou, max_det=max_det, in_format="a_no")
    k = int(num[0])
    return np.asarray(dets[0][:k]), k
