"""Faster R-CNN (ResNet-50 FPN) — RPN + RoI heads, fixed-shape JAX.

Equivalent of the reference's torchvision wrapper
(models/Faster-RCNN/run.py:15 `fasterrcnn_resnet50_fpn` with replaced
FastRCNNPredictor for nc+1 classes). The torchvision internals this
reproduces: AnchorGenerator (3 ratios × 1 size per FPN level), RPNHead,
proposal filtering (pre/post-NMS top-k, NMS 0.7), RoI sampling (512 @ 0.25
positive fraction), TwoMLPHead(1024) + FastRCNNPredictor, class-specific box
regression, and the standard losses. All data-dependent control flow is
replaced by padded top-k + masks so the whole train step jit-compiles.

Background = class 0; dataset classes shift +1 (reference
global_utils/dataset.py:91 convention).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.boxes import box_iou, xywh2xyxy, xyxy2xywh
from ..ops.nms import _suppress
from ..ops.resample import max_pool
from ..ops.roi_align import multiscale_roi_align
from .backbones import FPN, ResNet50
from .ssd import decode_boxes, encode_boxes

Dtype = Any

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
RPN_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
BOX_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def generate_anchors(fmap_shapes: Sequence[Tuple[int, int]], strides: Sequence[int]) -> List[jnp.ndarray]:
    """Per-level anchors (torchvision AnchorGenerator): centered cell anchors
    of one size × 3 ratios, in input-pixel xyxy."""
    all_anchors = []
    for (h, w), stride, size in zip(fmap_shapes, strides, ANCHOR_SIZES):
        ws, hs = [], []
        for r in ANCHOR_RATIOS:
            h_r = math.sqrt(r)
            w_r = 1.0 / h_r
            ws.append(w_r * size)
            hs.append(h_r * size)
        base = jnp.stack(
            [-jnp.asarray(ws) / 2, -jnp.asarray(hs) / 2, jnp.asarray(ws) / 2, jnp.asarray(hs) / 2], axis=1
        )  # (3, 4)
        sy, sx = jnp.meshgrid(jnp.arange(h) * stride, jnp.arange(w) * stride, indexing="ij")
        shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + base[None]).reshape(-1, 4)
        all_anchors.append(anchors)
    return all_anchors


class RPNHead(nn.Module):
    """Shared 3×3 conv + objectness/deltas 1×1 heads (torchvision RPNHead)."""

    num_anchors: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        conv = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            b = f.shape[0]
            logits.append(cls(t).reshape(b, -1))
            deltas.append(reg(t).reshape(b, -1, 4))
        return logits, deltas


class TwoMLPHead(nn.Module):
    """Flatten → 1024 → 1024 (torchvision TwoMLPHead)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc6")(x))
        return nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc7")(x))


class FastRCNNPredictor(nn.Module):
    """cls (nc+1) + class-specific reg (4·(nc+1)) heads."""

    num_classes: int  # includes background
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


class FasterRCNNBase(nn.Module):
    """Backbone + FPN + RPN head + RoI heads as one flax module.

    Pure feature computation; the proposal/sampling logic lives in the
    FasterRCNN wrapper as jitted functions (it mixes stop-gradient box math
    with learned features).
    """

    num_classes: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.body = ResNet50(dtype=self.dtype, name="body")
        self.fpn = FPN(dtype=self.dtype, name="fpn")
        self.rpn_head = RPNHead(dtype=self.dtype, name="rpn_head")
        self.box_head = TwoMLPHead(dtype=self.dtype, name="box_head")
        self.box_predictor = FastRCNNPredictor(self.num_classes, dtype=self.dtype, name="box_predictor")

    def features(self, x, train=False):
        feats = self.fpn(self.body(x, train), train)
        p6 = max_pool(feats[-1], 1, 2, 0)  # torchvision LastLevelMaxPool
        return feats, feats + [p6]

    def rpn(self, rpn_feats, train=False):
        return self.rpn_head(rpn_feats, train)

    def roi(self, box_feats, rois, image_size, train=False):
        pooled = multiscale_roi_align(box_feats, rois, image_size)
        x = self.box_head(pooled, train)
        return self.box_predictor(x)

    def __call__(self, x, rois, train: bool = False):
        """Init/trace path: features → rpn → roi on provided rois."""
        box_feats, rpn_feats = self.features(x, train)
        logits, deltas = self.rpn(rpn_feats, train)
        scores, box_deltas = self.roi(box_feats, rois, x.shape[1], train)
        return logits, deltas, scores, box_deltas


def _topk_proposals_per_level(logits, deltas, anchors, image_hw, k_pre, k_post, nms_thresh=0.7):
    """Decode + clip + per-level top-k + joint NMS → (K_post, 4) + scores."""
    boxes_all, scores_all, lvl_all = [], [], []
    for lvl, (lg, dl, an) in enumerate(zip(logits, deltas, anchors)):
        k = min(k_pre, lg.shape[0])
        sc, idx = jax.lax.top_k(lg, k)
        bx = decode_boxes(dl[idx], xyxy2xywh(an[idx]), RPN_WEIGHTS)
        bx = jnp.stack(
            [
                jnp.clip(bx[:, 0], 0, image_hw[1]),
                jnp.clip(bx[:, 1], 0, image_hw[0]),
                jnp.clip(bx[:, 2], 0, image_hw[1]),
                jnp.clip(bx[:, 3], 0, image_hw[0]),
            ],
            axis=1,
        )
        # drop tiny boxes (min_size 1e-3) by masking score
        wh = bx[:, 2:] - bx[:, :2]
        valid = (wh > 1e-3).all(axis=1)
        sc = jnp.where(valid, sc, -jnp.inf)
        boxes_all.append(bx)
        scores_all.append(sc)
        lvl_all.append(jnp.full((k,), lvl))
    boxes = jnp.concatenate(boxes_all)
    scores = jnp.concatenate(scores_all)
    lvls = jnp.concatenate(lvl_all)
    # torchvision NMS is per-level: offset boxes by level
    offset = lvls[:, None].astype(boxes.dtype) * 100000.0
    keep = _suppress(boxes + offset, scores, nms_thresh)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    final_scores, order = jax.lax.top_k(kept_scores, k_post)
    return boxes[order], final_scores


def rpn_propose(logits, deltas, anchors, image_hw, train: bool, k_pre: int = 512, k_post: int = 0):
    """Batched proposal generation. Returns rois (B, K, 4) xyxy + validity.

    torchvision uses pre/post-NMS top-k of 2000/1000; the dense O(K²) NMS
    matrix makes 512/512 (train) and 512/300 (eval) the memory-sane default
    here — on the small-image datasets the reference targets (tea leaves,
    300-640 px) recall is unaffected.
    """
    if not k_post:
        k_post = 512 if train else 300
    b = logits[0].shape[0]
    boxes, scores = jax.vmap(
        lambda i: _topk_proposals_per_level(
            [jax.lax.stop_gradient(l[i]) for l in logits],
            [jax.lax.stop_gradient(d[i]) for d in deltas],
            anchors, image_hw, k_pre, k_post,
        )
    )(jnp.arange(b))
    return boxes, scores > -jnp.inf


def assign_rpn_targets(anchors, gt_boxes, gt_mask, hi=0.7, lo=0.3, batch_size=256, pos_frac=0.5, rng=None):
    """RPN label assignment + balanced sampling (torchvision Matcher with
    allow_low_quality_matches + BalancedPositiveNegativeSampler)."""
    a = anchors.shape[0]
    iou = box_iou(gt_boxes, anchors) * gt_mask[:, None]  # (M, A)
    best_iou = iou.max(axis=0)
    best_gt = iou.argmax(axis=0)
    labels = jnp.where(best_iou >= hi, 1.0, jnp.where(best_iou < lo, 0.0, -1.0))
    # low-quality matches: anchors with max IoU for some GT become positive
    per_gt_best = iou.max(axis=1, keepdims=True)
    is_best = (iou >= per_gt_best - 1e-7) & (gt_mask[:, None] > 0) & (iou > 0)
    labels = jnp.where(is_best.any(axis=0), 1.0, labels)
    matched = gt_boxes[best_gt]

    pos = labels == 1.0
    neg = labels == 0.0
    n_pos_target = int(batch_size * pos_frac)
    r1, r2 = jax.random.split(rng)
    pos_priority = jnp.where(pos, jax.random.uniform(r1, (a,)), -1.0)
    neg_priority = jnp.where(neg, jax.random.uniform(r2, (a,)), -1.0)
    pos_rank = jnp.argsort(jnp.argsort(-pos_priority))
    n_pos = jnp.minimum(pos.sum(), n_pos_target)
    pos_sel = pos & (pos_rank < n_pos)
    neg_rank = jnp.argsort(jnp.argsort(-neg_priority))
    n_neg = jnp.minimum(neg.sum(), batch_size - n_pos)
    neg_sel = neg & (neg_rank < n_neg)
    return labels, matched, pos_sel, neg_sel


def rpn_loss(logits, deltas, anchors_cat, batch, rng):
    """Objectness BCE + smooth-L1 on sampled anchors."""
    b = logits[0].shape[0]
    lg = jnp.concatenate(logits, axis=1)  # (B, A)
    dl = jnp.concatenate(deltas, axis=1)  # (B, A, 4)
    gt_xyxy = batch["gt_boxes_xyxy"]
    rngs = jax.random.split(rng, b)
    labels, matched, pos_sel, neg_sel = jax.vmap(
        lambda gb, gm, r: assign_rpn_targets(anchors_cat, gb, gm, rng=r)
    )(gt_xyxy, batch["gt_mask"], rngs)
    sel = pos_sel | neg_sel
    n_sel = jnp.maximum(sel.sum(), 1.0)
    tgt = encode_boxes(matched, xyxy2xywh(anchors_cat)[None], RPN_WEIGHTS)
    diff = dl - tgt
    l1 = jnp.where(jnp.abs(diff) < 1.0 / 9.0, 0.5 * 9.0 * diff**2, jnp.abs(diff) - 0.5 / 9.0).sum(-1)
    loss_box = (l1 * pos_sel).sum() / n_sel
    bce = jnp.maximum(lg, 0) - lg * pos_sel + jnp.log1p(jnp.exp(-jnp.abs(lg)))
    loss_obj = (bce * sel).sum() / n_sel
    return loss_obj, loss_box


def sample_rois(proposals, valid, gt_xyxy, gt_cls1, gt_mask, rng, batch_size=512, pos_frac=0.25,
                fg_thresh=0.5, bg_thresh=0.5):
    """RoI sampling for the box head (torchvision select_training_samples):
    append GTs to proposals, match, sample 512 @ 25% positives."""
    k = proposals.shape[0]
    m = gt_xyxy.shape[0]
    all_boxes = jnp.concatenate([proposals, gt_xyxy], axis=0)  # (K+M, 4)
    all_valid = jnp.concatenate([valid, gt_mask > 0], axis=0)
    iou = box_iou(gt_xyxy, all_boxes) * gt_mask[:, None]
    best_iou = iou.max(axis=0)
    best_gt = iou.argmax(axis=0)
    labels = jnp.where(best_iou >= fg_thresh, gt_cls1[best_gt], 0)
    labels = jnp.where(all_valid, labels, -1)  # invalid → ignore
    pos = (labels > 0) & all_valid
    neg = (labels == 0) & all_valid

    n_pos_target = int(batch_size * pos_frac)
    r1, r2 = jax.random.split(rng)
    a = all_boxes.shape[0]
    pos_rank = jnp.argsort(jnp.argsort(-jnp.where(pos, jax.random.uniform(r1, (a,)), -1.0)))
    n_pos = jnp.minimum(pos.sum(), n_pos_target)
    pos_sel = pos & (pos_rank < n_pos)
    neg_rank = jnp.argsort(jnp.argsort(-jnp.where(neg, jax.random.uniform(r2, (a,)), -1.0)))
    n_neg = jnp.minimum(neg.sum(), batch_size - n_pos)
    neg_sel = neg & (neg_rank < n_neg)
    sel = pos_sel | neg_sel
    # produce a fixed batch_size index list (selected first, padding after)
    priority = jnp.where(sel, 1.0, 0.0) + jax.random.uniform(jax.random.fold_in(rng, 2), (a,)) * 0.01
    _, order = jax.lax.top_k(priority, batch_size)
    sel_boxes = all_boxes[order]
    sel_labels = labels[order]
    sel_matched = gt_xyxy[best_gt[order]]
    sel_mask = sel[order]
    return sel_boxes, sel_labels, sel_matched, sel_mask


def roi_head_loss(scores, box_deltas, labels, matched, rois, mask, num_classes):
    """CE + class-specific smooth-L1 (torchvision fastrcnn_loss)."""
    n = scores.shape[0]
    labels_c = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, labels_c[:, None], axis=-1)[:, 0]
    valid = mask & (labels >= 0)
    n_valid = jnp.maximum(valid.sum(), 1.0)
    loss_cls = (ce * valid).sum() / n_valid

    pos = valid & (labels > 0)
    deltas = box_deltas.reshape(n, num_classes, 4)
    d = jnp.take_along_axis(deltas, labels_c[:, None, None].repeat(4, -1), axis=1)[:, 0]
    tgt = encode_boxes(matched, xyxy2xywh(rois), BOX_WEIGHTS)
    diff = d - tgt
    l1 = jnp.where(jnp.abs(diff) < 1.0 / 9.0, 0.5 * 9.0 * diff**2, jnp.abs(diff) - 0.5 / 9.0).sum(-1)
    loss_box = (l1 * pos).sum() / jnp.maximum(valid.sum(), 1.0)
    return loss_cls, loss_box


class FasterRCNN:
    """User-facing Faster R-CNN: loss() for training, predict() for inference."""

    def __init__(self, num_classes: int, image_size: int = 512, dtype=jnp.float32):
        self.nc = num_classes
        self.image_size = image_size
        self.module = FasterRCNNBase(num_classes + 1, dtype=dtype)
        self.strides = (4, 8, 16, 32, 64)

    def init(self, rng, batch: int = 1):
        x = jnp.zeros((batch, self.image_size, self.image_size, 3))
        rois = jnp.zeros((8, 5))
        return self.module.init(rng, x, rois)

    def _anchors(self, image_size):
        shapes = [(image_size // s, image_size // s) for s in self.strides]
        return generate_anchors(shapes, self.strides)

    def loss(self, variables, batch, rng, train=True, mutable=None):
        """batch: img (B,S,S,3), gt_boxes (B,M,4) normalized xywh, gt_cls, gt_mask."""
        s = batch["img"].shape[1]
        anchors = self._anchors(s)
        anchors_cat = jnp.concatenate(anchors)
        gt_xyxy = xywh2xyxy(batch["gt_boxes"].astype(jnp.float32)) * s
        b = batch["img"].shape[0]

        def run(variables):
            method = lambda mdl, x, tr: mdl.features(x, tr)
            if mutable is not None:
                (box_feats, rpn_feats), aux = self.module.apply(
                    variables, batch["img"], train, method=method, mutable=mutable
                )
            else:
                box_feats, rpn_feats = self.module.apply(variables, batch["img"], train, method=method)
                aux = None
            logits, deltas = self.module.apply(
                variables, rpn_feats, train, method=lambda mdl, f, tr: mdl.rpn(f, tr)
            )
            r1, r2 = jax.random.split(rng)
            loss_obj, loss_rpn_box = rpn_loss(
                logits, deltas, anchors_cat,
                {"gt_boxes_xyxy": gt_xyxy, "gt_mask": batch["gt_mask"].astype(jnp.float32)},
                r1,
            )
            proposals, valid = rpn_propose(logits, deltas, anchors, (s, s), train)
            rngs = jax.random.split(r2, b)
            sel_boxes, sel_labels, sel_matched, sel_mask = jax.vmap(
                lambda p, v, gb, gc, gm, r: sample_rois(p, v, gb, gc.astype(jnp.int32) + 1, gm, r)
            )(proposals, valid, gt_xyxy, batch["gt_cls"], batch["gt_mask"].astype(jnp.float32), rngs)
            # flatten batch: rois (B*512, 5)
            n_roi = sel_boxes.shape[1]
            bidx = jnp.repeat(jnp.arange(b), n_roi).astype(jnp.float32)
            rois = jnp.concatenate([bidx[:, None], sel_boxes.reshape(-1, 4)], axis=1)
            scores, box_deltas = self.module.apply(
                variables, box_feats, rois, s, train,
                method=lambda mdl, f, r, sz, tr: mdl.roi(f, r, sz, tr),
            )
            loss_cls, loss_box = roi_head_loss(
                scores, box_deltas, sel_labels.reshape(-1), sel_matched.reshape(-1, 4),
                sel_boxes.reshape(-1, 4), sel_mask.reshape(-1), self.nc + 1,
            )
            total = loss_obj + loss_rpn_box + loss_cls + loss_box
            items = {
                "loss_objectness": loss_obj, "loss_rpn_box_reg": loss_rpn_box,
                "loss_classifier": loss_cls, "loss_box_reg": loss_box,
            }
            return (total, items) if aux is None else (total, items, aux)

        return run(variables)

    def predict(self, variables, img, conf=0.05, iou=0.5, max_det=100):
        s = img.shape[1]
        anchors = self._anchors(s)
        box_feats, rpn_feats = self.module.apply(
            variables, img, False, method=lambda mdl, x, tr: mdl.features(x, tr)
        )
        logits, deltas = self.module.apply(
            variables, rpn_feats, False, method=lambda mdl, f, tr: mdl.rpn(f, tr)
        )
        proposals, valid = rpn_propose(logits, deltas, anchors, (s, s), False)
        b, k = proposals.shape[:2]
        bidx = jnp.repeat(jnp.arange(b), k).astype(jnp.float32)
        rois = jnp.concatenate([bidx[:, None], proposals.reshape(-1, 4)], axis=1)
        scores, box_deltas = self.module.apply(
            variables, box_feats, rois, s, False,
            method=lambda mdl, f, r, sz, tr: mdl.roi(f, r, sz, tr),
        )
        probs = jax.nn.softmax(scores, axis=-1).reshape(b, k, self.nc + 1)[..., 1:]
        deltas_full = box_deltas.reshape(b, k, self.nc + 1, 4)

        def per_image(props, pr, dl, v):
            # decode per-class boxes; use best class's deltas
            best = pr.argmax(axis=-1)
            d = jnp.take_along_axis(dl[:, 1:], best[:, None, None].repeat(4, -1), axis=1)[:, 0]
            boxes = decode_boxes(d, xyxy2xywh(props), BOX_WEIGHTS)
            boxes = jnp.clip(boxes, 0, s)
            pr = pr * v[:, None]
            return boxes, pr

        boxes, probs = jax.vmap(per_image)(proposals, probs, deltas_full, valid.astype(jnp.float32))
        from ..ops.nms import non_max_suppression

        pred = jnp.concatenate([xyxy2xywh(boxes), probs], axis=-1)
        return non_max_suppression(pred, conf_thres=conf, iou_thres=iou, max_det=max_det, in_format="a_no")
