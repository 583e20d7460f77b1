"""Task-Aligned Assigner in fixed-shape JAX.

TPU-native re-implementation of the reference's TAL assigner
(utils/tal.py:14 `TaskAlignedAssigner`). The torch version relies on
boolean indexing and data-dependent shapes (with a CPU fallback on CUDA
OOM, tal.py:74-80); here everything is padded + masked: ground truths come
in as (B, M, ...) with a validity mask, anchors as (A, 2), and every
intermediate is a dense (B, M, A) tensor of masked matmul/compare ops —
XLA-friendly, no host sync, differentiable-free (callers stop_gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


def _kth_largest(x, k):
    """k-th largest value along the last axis, as k-1 max+mask passes.

    lax.top_k over A=8400 lowers as a sort on this TPU toolchain: 7.2 ms at
    (48, 16, 8400) vs 0.24 ms for this form (tools/exp_loss_breakdown.py,
    real v5e, 2026-08-19). Only the k-th VALUE is needed by the threshold
    formulation below, so the sort is pure waste. Tie semantics: each pass
    masks ALL elements equal to the current max, so with duplicate metrics
    this returns the k-th largest DISTINCT value — the `>= kth` threshold
    then admits every tied anchor (a superset of sorted top-k). Exact ties
    in the f32 align metric are measure-zero away from init, and the
    threshold form is already documented as init-divergent vs the exact
    reference semantics (see the formulation note above).
    """
    cur = x
    for _ in range(k - 1):
        mx = cur.max(axis=-1, keepdims=True)
        cur = jnp.where(cur >= mx, -jnp.inf, cur)
    return cur.max(axis=-1, keepdims=True)


def select_candidates_in_gts(anc_points, gt_bboxes, eps=1e-9):
    """Anchors whose center lies strictly inside each GT box.

    Args:
        anc_points: (A, 2) xy.
        gt_bboxes: (B, M, 4) xyxy.
    Returns:
        (B, M, A) float mask.
    """
    lt = anc_points[None, None] - gt_bboxes[..., None, :2]  # (B, M, A, 2)
    rb = gt_bboxes[..., None, 2:] - anc_points[None, None]
    deltas = jnp.concatenate([lt, rb], axis=-1)
    return (deltas.min(axis=-1) > eps).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta", "exact_topk"))
def task_aligned_assign(
    pd_scores,
    pd_bboxes,
    anc_points,
    gt_labels,
    gt_bboxes,
    mask_gt,
    topk=10,
    num_classes=80,
    alpha=0.5,
    beta=6.0,
    eps=1e-9,
    exact_topk=None,
):
    """Assign GTs to anchors by the task-aligned metric score^α · CIoU^β.

    Args:
        pd_scores: (B, A, nc) sigmoided class scores.
        pd_bboxes: (B, A, 4) decoded xyxy boxes (same units as gt_bboxes).
        anc_points: (A, 2) anchor centers (same units).
        gt_labels: (B, M) int class ids.
        gt_bboxes: (B, M, 4) xyxy, zero-padded.
        mask_gt: (B, M) 1.0 for real GTs.

    Returns:
        target_labels: (B, A) int.
        target_bboxes: (B, A, 4) xyxy.
        target_scores: (B, A, nc) soft targets (normalized align metric).
        fg_mask: (B, A) bool foreground anchors.
        target_gt_idx: (B, A) int index of the assigned GT.
    """
    b, a, nc = pd_scores.shape
    m = gt_bboxes.shape[1]
    mask_gt = mask_gt.astype(jnp.float32)

    # --- positive candidate mask -----------------------------------------
    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)  # (B, M, A)
    valid = mask_in_gts * mask_gt[..., None]

    # per-(gt, anchor) class score: pd_scores[b, a, gt_label[b, m]]
    ps = jnp.swapaxes(pd_scores, 1, 2)  # (B, nc, A)
    labels = jnp.clip(gt_labels, 0, nc - 1).astype(jnp.int32)
    bbox_scores = jnp.take_along_axis(ps, labels[..., None], axis=1)  # (B, M, A)
    bbox_scores = bbox_scores * valid

    overlaps = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True
    )  # (B, M, A)
    overlaps = jnp.clip(overlaps, 0.0) * valid

    align_metric = bbox_scores**alpha * overlaps**beta

    # --- top-k per GT ------------------------------------------------------
    # Two formulations:
    # * exact (reference tal.py select_topk_candidates semantics): scatter
    #   the top-k INDICES — keeps zero-metric in-GT anchors among the k
    #   (torch takes exactly k per GT; lax.top_k and torch.topk both break
    #   ties toward the lower index). Used off-TPU and by parity tests.
    # * threshold: an anchor is a candidate iff its metric reaches the GT's
    #   k-th largest metric AND is > eps. Equivalent at convergence (in-GT
    #   anchors have positive CIoU), differs at random init where CIoU ≤ 0
    #   candidates are dropped. Kept as the TPU default: the index-scatter
    #   expansion stalled the axon compiler at M ≥ 16 and this form keeps
    #   the compiled graph O(B·M·A).
    k = min(topk, a)
    if exact_topk is None:
        exact_topk = jax.default_backend() == "cpu"
    if exact_topk:
        _, topk_idxs = jax.lax.top_k(align_metric, k)  # (B, M, k)
        bi = jnp.arange(b)[:, None, None]
        mi = jnp.arange(m)[None, :, None]
        mask_topk = jnp.zeros_like(align_metric).at[bi, mi, topk_idxs].set(1.0)
    else:
        kth = _kth_largest(align_metric, k)  # (B, M, 1)
        mask_topk = ((align_metric >= kth) & (align_metric > eps)).astype(align_metric.dtype)
    mask_pos = mask_topk * valid  # (B, M, A)

    # --- resolve anchors claimed by multiple GTs: keep max overlap ---------
    fg_counts = mask_pos.sum(axis=-2)  # (B, A)
    max_overlap_gt = jnp.argmax(overlaps, axis=1)  # (B, A)
    is_max = (
        jnp.arange(m)[None, :, None] == max_overlap_gt[:, None, :]
    ).astype(mask_pos.dtype)  # (B, M, A) via broadcast compare (no one-hot)
    mask_pos = jnp.where((fg_counts[:, None, :] > 1), is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=-2) > 0  # (B, A)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)  # (B, A)

    # --- gather targets ----------------------------------------------------
    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)  # (B, A)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None], axis=1
    )  # (B, A, 4)

    target_scores = jax.nn.one_hot(target_labels, nc, dtype=pd_scores.dtype)
    target_scores = target_scores * fg_mask[..., None]

    # --- normalize: scale one-hot by align metric / per-GT max --------------
    align_metric = align_metric * mask_pos
    pos_align_metrics = align_metric.max(axis=-1, keepdims=True)  # (B, M, 1)
    pos_overlaps = (overlaps * mask_pos).max(axis=-1, keepdims=True)  # (B, M, 1)
    norm_align = (align_metric * pos_overlaps / (pos_align_metrics + eps)).max(axis=-2)  # (B, A)
    target_scores = target_scores * norm_align[..., None]

    return target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx


def select_candidates_in_rotated_gts(anc_points, gt_rboxes, eps=1e-9):
    """Anchors whose center lies inside each rotated GT box
    (reference tal.py:305 RotatedTaskAlignedAssigner.select_candidates_in_gts):
    project the center onto the box edge vectors ab/ad from corner a.

    Args:
        anc_points: (A, 2) xy.
        gt_rboxes: (B, M, 5) xywhr.
    Returns:
        (B, M, A) float mask.
    """
    from ..ops.boxes import xywhr2xyxyxyxy

    corners = xywhr2xyxyxyxy(gt_rboxes)  # (B, M, 4, 2)
    a, b_, d = corners[..., 0, :], corners[..., 1, :], corners[..., 3, :]
    ab = (b_ - a)[:, :, None, :]  # (B, M, 1, 2)
    ad = (d - a)[:, :, None, :]
    ap = anc_points[None, None] - a[:, :, None, :]  # (B, M, A, 2)
    norm_ab = (ab * ab).sum(-1)
    norm_ad = (ad * ad).sum(-1)
    ap_ab = (ap * ab).sum(-1)
    ap_ad = (ap * ad).sum(-1)
    inside = (ap_ab >= 0) & (ap_ab <= norm_ab) & (ap_ad >= 0) & (ap_ad <= norm_ad)
    return inside.astype(jnp.float32)


def rotated_task_aligned_assign(
    pd_scores,
    pd_rboxes,
    anc_points,
    gt_labels,
    gt_rboxes,
    mask_gt,
    topk=10,
    num_classes=80,
    alpha=0.5,
    beta=6.0,
    eps=1e-9,
):
    """Rotated-box TAL assignment (reference tal.py:298): identical to
    `task_aligned_assign` but overlaps use probiou and candidate anchors use
    the rotated-containment test. Boxes are (…, 5) xywhr.
    """
    from .extra import probiou

    b, a, nc = pd_scores.shape
    m = gt_rboxes.shape[1]
    mask_gt = mask_gt.astype(jnp.float32)

    mask_in_gts = select_candidates_in_rotated_gts(anc_points, gt_rboxes)  # (B, M, A)
    valid = mask_in_gts * mask_gt[..., None]

    ps = jnp.swapaxes(pd_scores, 1, 2)  # (B, nc, A)
    labels = jnp.clip(gt_labels, 0, nc - 1).astype(jnp.int32)
    bbox_scores = jnp.take_along_axis(ps, labels[..., None], axis=1) * valid  # (B, M, A)

    overlaps = probiou(gt_rboxes[:, :, None, :], pd_rboxes[:, None, :, :])  # (B, M, A)
    overlaps = jnp.clip(overlaps, 0.0) * valid

    align_metric = bbox_scores**alpha * overlaps**beta

    k = min(topk, a)
    kth = _kth_largest(align_metric, k)  # sort-free; see _kth_largest
    mask_topk = ((align_metric >= kth) & (align_metric > eps)).astype(align_metric.dtype)
    mask_pos = mask_topk * valid

    fg_counts = mask_pos.sum(axis=-2)
    max_overlap_gt = jnp.argmax(overlaps, axis=1)
    is_max = (jnp.arange(m)[None, :, None] == max_overlap_gt[:, None, :]).astype(mask_pos.dtype)
    mask_pos = jnp.where((fg_counts[:, None, :] > 1), is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=-2) > 0
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)

    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
    target_rboxes = jnp.take_along_axis(gt_rboxes, target_gt_idx[..., None], axis=1)  # (B, A, 5)

    target_scores = jax.nn.one_hot(target_labels, nc, dtype=pd_scores.dtype)
    target_scores = target_scores * fg_mask[..., None]

    align_metric = align_metric * mask_pos
    pos_align_metrics = align_metric.max(axis=-1, keepdims=True)
    pos_overlaps = (overlaps * mask_pos).max(axis=-1, keepdims=True)
    norm_align = (align_metric * pos_overlaps / (pos_align_metrics + eps)).max(axis=-2)
    target_scores = target_scores * norm_align[..., None]

    return target_labels, target_rboxes, target_scores, fg_mask, target_gt_idx
