"""SSD300 detector (NHWC, flax) — prior boxes, head, loss, decode.

Equivalent of the reference's SSD setup (models/SSD/run.py:19): torchvision
ssd300_vgg16 with replaced classification head (in_channels
[512,1024,512,256,256,256], anchors [4,6,6,6,4,4]) or the custom ResNet-50
backbone (models/SSD/backbone.py:5) + DefaultBoxGenerator + SSDHead.
Background is class 0; dataset classes are shifted +1 like the reference's
global_utils dataset (global_utils/dataset.py:91).

Everything is fixed-shape: priors are static, target matching is dense
(A anchors × M padded GTs), hard-negative mining uses masked top-k.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.boxes import box_iou, xywh2xyxy, xyxy2xywh
from ..ops.nms import non_max_suppression
from .backbones import L2Norm, SSDExtraVGG, SSDResNetBackbone, VGG16Features

Dtype = Any

# torchvision ssd300_vgg16 DefaultBoxGenerator configuration
SSD300_ASPECT_RATIOS = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
SSD300_SCALES = (0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05)
SSD300_NUM_ANCHORS = tuple(2 + 2 * len(a) for a in SSD300_ASPECT_RATIOS)  # (4,6,6,6,4,4)
BOX_CODER_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def default_boxes(
    fmap_shapes: Sequence[Tuple[int, int]],
    aspect_ratios=SSD300_ASPECT_RATIOS,
    scales=SSD300_SCALES,
) -> jnp.ndarray:
    """SSD default boxes, normalized cxcywh (torchvision DefaultBoxGenerator)."""
    priors = []
    for k, (fh, fw) in enumerate(fmap_shapes):
        sk = scales[k]
        sk1 = scales[k + 1]
        wh = [(sk, sk), (math.sqrt(sk * sk1), math.sqrt(sk * sk1))]
        for ar in aspect_ratios[k]:
            r = math.sqrt(ar)
            wh += [(sk * r, sk / r), (sk / r, sk * r)]
        cy, cx = jnp.meshgrid(
            (jnp.arange(fh) + 0.5) / fh, (jnp.arange(fw) + 0.5) / fw, indexing="ij"
        )
        centers = jnp.stack([cx, cy], -1).reshape(-1, 1, 2)  # (fh*fw, 1, 2)
        whs = jnp.asarray(wh)[None]  # (1, na, 2)
        boxes = jnp.concatenate(
            [jnp.broadcast_to(centers, (fh * fw, len(wh), 2)), jnp.broadcast_to(whs, (fh * fw, len(wh), 2))],
            axis=-1,
        ).reshape(-1, 4)
        priors.append(boxes)
    return jnp.concatenate(priors, axis=0)  # (A, 4) cxcywh in [0,1]


def encode_boxes(gt_xyxy, priors_cxcywh, weights=BOX_CODER_WEIGHTS):
    """torchvision BoxCoder.encode: regression targets from matched GTs."""
    gt = xyxy2xywh(gt_xyxy)
    wx, wy, ww, wh = weights
    tx = wx * (gt[..., 0] - priors_cxcywh[..., 0]) / priors_cxcywh[..., 2]
    ty = wy * (gt[..., 1] - priors_cxcywh[..., 1]) / priors_cxcywh[..., 3]
    tw = ww * jnp.log(jnp.maximum(gt[..., 2], 1e-8) / priors_cxcywh[..., 2])
    th = wh * jnp.log(jnp.maximum(gt[..., 3], 1e-8) / priors_cxcywh[..., 3])
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(deltas, priors_cxcywh, weights=BOX_CODER_WEIGHTS):
    """torchvision BoxCoder.decode → xyxy."""
    wx, wy, ww, wh = weights
    cx = deltas[..., 0] / wx * priors_cxcywh[..., 2] + priors_cxcywh[..., 0]
    cy = deltas[..., 1] / wy * priors_cxcywh[..., 3] + priors_cxcywh[..., 1]
    w = jnp.exp(jnp.clip(deltas[..., 2] / ww, max=math.log(1000.0 / 16))) * priors_cxcywh[..., 2]
    h = jnp.exp(jnp.clip(deltas[..., 3] / wh, max=math.log(1000.0 / 16))) * priors_cxcywh[..., 3]
    return xywh2xyxy(jnp.stack([cx, cy, w, h], axis=-1))


def match_priors(priors_xyxy, gt_boxes, gt_cls, gt_mask, iou_thresh=0.5):
    """SSDMatcher: per-prior best GT (IoU ≥ 0.5) + force-match best prior per GT.

    Args: priors (A,4) xyxy normalized; gt_boxes (M,4) xyxy normalized;
    gt_cls (M,) with classes already 1-based; gt_mask (M,).
    Returns: labels (A,) int (0 = background), matched gt box (A,4).
    """
    a = priors_xyxy.shape[0]
    iou = box_iou(gt_boxes, priors_xyxy)  # (M, A)
    iou = iou * gt_mask[:, None]
    best_gt_iou = iou.max(axis=0)  # (A,)
    best_gt_idx = iou.argmax(axis=0)
    # force-match: for each valid GT, its best prior gets that GT
    best_prior_per_gt = iou.argmax(axis=1)  # (M,)
    force = jnp.zeros((a,), dtype=bool)
    force_idx = jnp.zeros((a,), dtype=jnp.int32)
    m = gt_boxes.shape[0]
    gt_ids = jnp.arange(m)
    force = force.at[best_prior_per_gt].set(gt_mask > 0)
    force_idx = force_idx.at[best_prior_per_gt].set(jnp.where(gt_mask > 0, gt_ids, 0).astype(jnp.int32))
    matched_idx = jnp.where(force, force_idx, best_gt_idx)
    positive = force | (best_gt_iou >= iou_thresh)
    labels = jnp.where(positive, gt_cls[matched_idx], 0)
    matched_boxes = gt_boxes[matched_idx]
    return labels.astype(jnp.int32), matched_boxes, positive


def ssd_loss(cls_logits, bbox_reg, priors_cxcywh, batch, num_classes, neg_ratio=3.0):
    """SSD multibox loss (torchvision SSD.compute_loss): smooth-L1 on
    positives + CE with 3:1 hard-negative mining.

    batch: gt_boxes (B,M,4) normalized xywh, gt_cls (B,M) 0-based → shifted
    +1 internally (background=0), gt_mask (B,M).
    """
    b, a, _ = cls_logits.shape
    priors_xyxy = xywh2xyxy(priors_cxcywh)
    gt_xyxy = xywh2xyxy(batch["gt_boxes"].astype(jnp.float32))
    gt_cls1 = batch["gt_cls"].astype(jnp.int32) + 1

    labels, matched, positive = jax.vmap(
        lambda gb, gc, gm: match_priors(priors_xyxy, gb, gc, gm)
    )(gt_xyxy, gt_cls1, batch["gt_mask"].astype(jnp.float32))

    pos = positive.astype(jnp.float32)  # (B, A)
    num_pos = jnp.maximum(pos.sum(), 1.0)

    # box regression
    targets = encode_boxes(matched, priors_cxcywh[None])
    diff = bbox_reg - targets
    l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2, jnp.abs(diff) - 0.5).sum(-1)
    loss_box = (l1 * pos).sum() / num_pos

    # classification with hard negative mining
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]  # (B, A)
    neg_ce = jnp.where(positive, -jnp.inf, -logp[..., 0])  # background loss for negatives
    n_neg = jnp.minimum(neg_ratio * pos.sum(axis=1, keepdims=True), a - pos.sum(axis=1, keepdims=True))
    order = jnp.argsort(-neg_ce, axis=1)
    rank = jnp.argsort(order, axis=1).astype(jnp.float32)
    neg_keep = (rank < n_neg) & ~positive
    loss_cls = (ce * (pos + neg_keep.astype(jnp.float32))).sum() / num_pos
    return loss_box + loss_cls, {"bbox_regression": loss_box, "classification": loss_cls}


class SSDHead(nn.Module):
    """Per-level 3×3 cls + reg heads (torchvision SSDHead / the replaced
    SSDClassificationHead at reference run.py:24)."""

    num_classes: int  # includes background
    num_anchors: Sequence[int] = SSD300_NUM_ANCHORS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        cls_all, reg_all = [], []
        for i, (f, na) in enumerate(zip(feats, self.num_anchors)):
            b = f.shape[0]
            cls = nn.Conv(na * self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                          dtype=self.dtype, name=f"cls{i}")(f)
            reg = nn.Conv(na * 4, (3, 3), padding=[(1, 1), (1, 1)],
                          dtype=self.dtype, name=f"reg{i}")(f)
            cls_all.append(cls.reshape(b, -1, self.num_classes))
            reg_all.append(reg.reshape(b, -1, 4))
        return jnp.concatenate(cls_all, 1), jnp.concatenate(reg_all, 1)


class SSD(nn.Module):
    """SSD300 with VGG16 or ResNet-50 backbone (reference create_model,
    models/SSD/run.py:19). Call returns (cls_logits, bbox_reg, fmap_shapes)."""

    num_classes: int  # includes background (nc + 1)
    backbone: str = "vgg16"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_feats: bool = False):
        if self.backbone == "vgg16":
            conv4_3, conv7 = VGG16Features(dtype=self.dtype, name="features")(x, train)
            conv4_3 = L2Norm(dtype=self.dtype, name="l2norm")(conv4_3)
            extras = SSDExtraVGG(dtype=self.dtype, name="extra")(conv7, train)
            feats = [conv4_3, conv7, *extras]
        elif self.backbone == "resnet50":
            feats = SSDResNetBackbone(dtype=self.dtype, name="backbone")(x, train)
        else:
            raise ValueError("backbone must be 'vgg16' or 'resnet50'")
        cls_logits, bbox_reg = SSDHead(self.num_classes, dtype=self.dtype, name="head")(feats, train)
        if return_feats:
            return cls_logits, bbox_reg, feats
        return cls_logits, bbox_reg


class SSDDetector:
    """User-facing wrapper: init/loss/predict with static priors."""

    def __init__(self, num_classes: int, backbone: str = "vgg16", image_size: int = 300,
                 dtype=jnp.float32):
        self.nc = num_classes  # foreground classes
        self.module = SSD(num_classes + 1, backbone, dtype=dtype)
        self.image_size = image_size
        self._priors = None

    def init(self, rng, batch: int = 1):
        x = jnp.zeros((batch, self.image_size, self.image_size, 3))
        variables = self.module.init(rng, x)
        self._compute_priors(variables)
        return variables

    def _compute_priors(self, variables):
        x = jnp.zeros((1, self.image_size, self.image_size, 3))
        _, _, feats = jax.eval_shape(
            lambda v: self.module.apply(v, x, return_feats=True), variables
        )
        self._priors = default_boxes([f.shape[1:3] for f in feats])

    @property
    def priors(self):
        return self._priors

    def loss(self, variables, batch, train=True, mutable=None, rngs=None):
        if self._priors is None:
            self._compute_priors(variables)
        kwargs = {"mutable": mutable} if mutable is not None else {}
        if rngs is not None:
            kwargs["rngs"] = rngs
        out = self.module.apply(variables, batch["img"], train=train, **kwargs)
        (cls_logits, bbox_reg), aux = (out, None) if mutable is None else out
        total, items = ssd_loss(cls_logits, bbox_reg, self._priors, batch, self.nc + 1)
        return (total, items) if aux is None else (total, items, aux)

    def predict(self, variables, img, conf=0.25, iou=0.45, max_det=300, score_thresh=0.01):
        if self._priors is None:
            self._compute_priors(variables)
        cls_logits, bbox_reg = self.module.apply(variables, img)
        boxes = decode_boxes(bbox_reg, self._priors[None]) * self.image_size  # (B, A, 4) xyxy px
        scores = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]  # drop background
        boxes = jnp.clip(boxes, 0, self.image_size)
        pred = jnp.concatenate([xyxy2xywh(boxes), scores], axis=-1)
        return non_max_suppression(pred, conf_thres=conf, iou_thres=iou, max_det=max_det, in_format="a_no")
