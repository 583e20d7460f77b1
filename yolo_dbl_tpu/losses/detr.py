"""RT-DETR set-prediction loss: Hungarian matching + VFL/L1/GIoU.

TPU-native equivalent of the reference's HungarianMatcher
(models/utils/ops.py:12) and DETRLoss / RTDETRDetectionLoss
(models/utils/loss.py:13,291). Fixed-shape design: GTs are padded to M with
a validity mask; the (Q, M) cost matrices for ALL decoder layers are solved
in ONE host callback to scipy's linear_sum_assignment (the reference also
solves on CPU), returning a dense (…, M) gt→query index tensor that is
gathered in-graph. Everything else (costs, VFL, L1, GIoU) stays on-device.

Denoising-group losses (dn_meta) are not modeled — our decoder does not run
contrastive denoising queries yet; `denoising_class_embed` exists for
checkpoint parity.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_iou

COST_GAIN = {"class": 2.0, "bbox": 5.0, "giou": 2.0}
LOSS_GAIN = {"class": 1.0, "bbox": 5.0, "giou": 2.0}


def _lsa_host(cost: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Host solver: cost (N, Q, M) float32, counts (N,) int32 → (N, M) int32
    query index per (padded) GT; padded columns get 0 (masked downstream)."""
    from scipy.optimize import linear_sum_assignment

    # pure_callback may hand jax Arrays (not ndarrays): materialize to host
    # FIRST — jax indexing inside a callback thread re-enters the dispatch
    # lock the blocked main thread holds and deadlocks the whole process.
    cost = np.asarray(cost)
    counts = np.asarray(counts)
    n, q, m = cost.shape
    out = np.zeros((n, m), np.int32)
    for i in range(n):
        k = int(counts[i])
        if k:
            c = np.nan_to_num(cost[i, :, :k], nan=0.0, posinf=0.0, neginf=0.0)
            rows, cols = linear_sum_assignment(c)
            out[i, cols] = rows.astype(np.int32)
    return out


def hungarian_match(pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask,
                    alpha=0.25, gamma=2.0):
    """Optimal assignment (reference HungarianMatcher.forward, ops.py:46).

    Args:
        pred_boxes: (N, Q, 4) xywh normalized (stop-gradient applied inside).
        pred_scores: (N, Q, nc) logits.
        gt_boxes: (N, M, 4) xywh normalized, zero-padded.
        gt_cls: (N, M) int.
        gt_mask: (N, M) 1.0 for real GTs.
    Returns:
        (N, M) int32 — matched query index per GT row (padded rows: 0).
    """
    pb = jax.lax.stop_gradient(pred_boxes)
    ps = jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores))  # use_fl path
    nc = ps.shape[-1]
    labels = jnp.clip(gt_cls, 0, nc - 1).astype(jnp.int32)
    # focal-style class cost at the GT class (ops.py:85-90)
    p = jnp.take_along_axis(ps, labels[:, None, :], axis=-1)  # (N, Q, M)
    neg = (1 - alpha) * (p**gamma) * (-jnp.log(1 - p + 1e-8))
    pos = alpha * ((1 - p) ** gamma) * (-jnp.log(p + 1e-8))
    cost_class = pos - neg
    cost_bbox = jnp.abs(pb[:, :, None, :] - gt_boxes[:, None, :, :]).sum(-1)
    giou = bbox_iou(pb[:, :, None, :], gt_boxes[:, None, :, :], xywh=True, GIoU=True)
    cost = (COST_GAIN["class"] * cost_class
            + COST_GAIN["bbox"] * cost_bbox
            + COST_GAIN["giou"] * (1.0 - giou))
    counts = gt_mask.sum(-1).astype(jnp.int32)
    n, _, m = cost.shape
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((n, m), jnp.int32),
        cost.astype(jnp.float32),
        counts,
        vmap_method="sequential",
    )


def _layer_loss(pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask, q_idx,
                num_gts, alpha=0.75, gamma=2.0):
    """VFL class + L1 + GIoU for one decoder layer given its matching
    (reference DETRLoss._get_loss, loss.py:216)."""
    b, q, nc = pred_scores.shape
    m = gt_boxes.shape[1]
    oh_q = jax.nn.one_hot(q_idx, q) * gt_mask[..., None]           # (B, M, Q)
    oh_c = jax.nn.one_hot(jnp.clip(gt_cls, 0, nc - 1), nc)          # (B, M, nc)
    one_hot = jnp.einsum("bmq,bmc->bqc", oh_q, oh_c)                # (B, Q, nc)

    matched_pred = jnp.take_along_axis(pred_boxes, q_idx[..., None], axis=1)  # (B, M, 4)
    iou = jnp.clip(bbox_iou(jax.lax.stop_gradient(matched_pred), gt_boxes, xywh=True), 0.0)
    gt_scores = jnp.einsum("bmq,bm->bq", oh_q, iou * gt_mask)[..., None] * one_hot

    # varifocal (loss.py:16): weight = alpha·p^γ·(1−label) + gt_score·label
    p = jax.nn.sigmoid(pred_scores)
    weight = alpha * p**gamma * (1 - one_hot) + gt_scores * one_hot
    bce = jnp.maximum(pred_scores, 0) - pred_scores * gt_scores + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
    loss_cls = (bce * weight).sum() * q / jnp.maximum(num_gts, 1.0)

    l1 = (jnp.abs(matched_pred - gt_boxes).sum(-1) * gt_mask).sum() / jnp.maximum(num_gts, 1.0)
    giou_m = bbox_iou(matched_pred, gt_boxes, xywh=True, GIoU=True)
    loss_giou = ((1.0 - giou_m) * gt_mask).sum() / jnp.maximum(num_gts, 1.0)

    return {
        "class": LOSS_GAIN["class"] * loss_cls,
        "bbox": LOSS_GAIN["bbox"] * l1,
        "giou": LOSS_GAIN["giou"] * loss_giou,
    }


def rtdetr_loss(outputs: Tuple, batch: Dict, nc: int) -> Tuple[jnp.ndarray, Dict]:
    """Full RT-DETR training loss (reference RTDETRDetectionModel.loss,
    tasks.py:534): encoder proposals prepended as layer 0, per-layer Hungarian
    matching, sum over all layers; the reported items are the final layer's.

    outputs: (dec_bboxes (B,L,Q,4), dec_scores (B,L,Q,nc),
              enc_bboxes (B,Q,4), enc_scores (B,Q,nc)) — normalized cxcywh.
    batch: gt_boxes (B,M,4) normalized xywh, gt_cls (B,M), gt_mask (B,M).
    """
    dec_bboxes, dec_scores, enc_bboxes, enc_scores = outputs
    layers_b = jnp.concatenate([enc_bboxes[:, None], dec_bboxes], axis=1)  # (B, L+1, Q, 4)
    layers_s = jnp.concatenate([enc_scores[:, None], dec_scores], axis=1)

    gt_boxes = jnp.asarray(batch["gt_boxes"], jnp.float32)
    gt_cls = jnp.asarray(batch["gt_cls"], jnp.int32)
    gt_mask = jnp.asarray(batch["gt_mask"], jnp.float32)
    b, L1, q, _ = layers_b.shape
    m = gt_boxes.shape[1]
    num_gts = gt_mask.sum()

    # one host callback for all layers: (B*(L+1), Q, M)
    flat_b = layers_b.reshape(b * L1, q, 4)
    flat_s = layers_s.reshape(b * L1, q, -1)
    rep = lambda t: jnp.repeat(t[:, None], L1, axis=1).reshape(b * L1, *t.shape[1:])
    q_idx = hungarian_match(flat_b, flat_s, rep(gt_boxes), rep(gt_cls), rep(gt_mask))
    q_idx = q_idx.reshape(b, L1, m)

    total = jnp.zeros(())
    final_items = None
    for l in range(L1):
        items = _layer_loss(layers_b[:, l], layers_s[:, l], gt_boxes, gt_cls,
                            gt_mask, q_idx[:, l], num_gts)
        total = total + items["class"] + items["bbox"] + items["giou"]
        if l == L1 - 1:
            final_items = items
    return total, {"giou": final_items["giou"], "cls": final_items["class"],
                   "l1": final_items["bbox"]}
