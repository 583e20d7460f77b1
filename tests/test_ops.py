"""Unit tests for box/anchor/resample/NMS ops against golden values.

Golden behavior references: torch (CPU) for grid_sample/pixel_shuffle, and
hand-computed boxes for the rest — mirroring the reference's docstring-example
test style (SURVEY.md §4) but assert-based.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_dbl_tpu.ops import (
    bbox_iou,
    box_iou,
    dist2bbox,
    bbox2dist,
    make_anchors,
    non_max_suppression,
    xywh2xyxy,
    xyxy2xywh,
)
from yolo_dbl_tpu.ops.resample import (
    avg_pool2,
    grid_sample_bilinear,
    nearest_upsample,
    pixel_shuffle,
    pixel_unshuffle,
)


def test_box_roundtrip():
    boxes = jnp.array([[10.0, 20.0, 30.0, 60.0], [0.0, 0.0, 5.0, 5.0]])
    xywh = xyxy2xywh(boxes)
    np.testing.assert_allclose(xywh[0], [20.0, 40.0, 20.0, 40.0])
    np.testing.assert_allclose(xywh2xyxy(xywh), boxes, atol=1e-6)


def test_box_iou_golden():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 5.0, 15.0, 15.0], [0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [25 / 175, 1.0, 0.0], atol=1e-6)


def test_ciou_le_iou():
    a = jnp.array([5.0, 5.0, 10.0, 10.0])  # xywh
    b = jnp.array([6.0, 5.0, 8.0, 12.0])
    plain = bbox_iou(a, b)
    ciou = bbox_iou(a, b, CIoU=True)
    assert ciou <= plain
    assert bbox_iou(a, a, CIoU=True) == pytest.approx(1.0, abs=1e-5)


def test_make_anchors():
    pts, strides = make_anchors([(2, 2), (1, 1)], [8, 16])
    assert pts.shape == (5, 2)
    np.testing.assert_allclose(pts[:4], [[0.5, 0.5], [1.5, 0.5], [0.5, 1.5], [1.5, 1.5]])
    np.testing.assert_allclose(strides.ravel(), [8, 8, 8, 8, 16])


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = jnp.array([[4.0, 4.0], [10.0, 2.0]])
    dist = jnp.array([[1.0, 2.0, 3.0, 1.5], [0.5, 0.5, 0.5, 0.5]])
    xyxy = dist2bbox(dist, anchors, xywh=False)
    np.testing.assert_allclose(xyxy[0], [3.0, 2.0, 7.0, 5.5])
    back = bbox2dist(anchors, xyxy, reg_max=16)
    np.testing.assert_allclose(back, dist, atol=1e-6)


def test_nearest_upsample_and_avgpool():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = nearest_upsample(x, 2)
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(up[0, :2, :2, 0], [[0, 0], [0, 0]])
    down = avg_pool2(up)
    np.testing.assert_allclose(down, x)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4, 16)).astype(np.float32)  # NHWC, C=16=4*2*2
    ours = pixel_shuffle(jnp.asarray(x), 2)
    ref = torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    back = pixel_unshuffle(ours, 2)
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, size=(2, 6, 8, 2))).astype(np.float32)  # incl. out-of-range
    ours = grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid))
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        align_corners=False,
        padding_mode="border",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nms_suppresses_overlaps():
    # two overlapping boxes of the same class + one distinct box
    boxes_xywh = jnp.array([[50.0, 50.0, 20.0, 20.0], [52.0, 50.0, 20.0, 20.0], [150.0, 150.0, 30.0, 30.0]])
    scores = jnp.array([[0.9, 0.0], [0.8, 0.0], [0.0, 0.7]])
    pred = jnp.concatenate([boxes_xywh, scores], axis=-1)[None]  # (1, 3, 6)
    dets, n = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45, max_det=10, in_format="a_no")
    assert int(n[0]) == 2
    np.testing.assert_allclose(dets[0, 0], [40, 40, 60, 60, 0.9, 0], atol=1e-5)
    np.testing.assert_allclose(dets[0, 1], [135, 135, 165, 165, 0.7, 1], atol=1e-5)
    # padding rows are zero
    np.testing.assert_allclose(dets[0, 2:], 0.0)


def test_nms_class_aware():
    # same position, different classes: both survive class-aware NMS
    boxes = jnp.array([[50.0, 50.0, 20.0, 20.0], [50.0, 50.0, 20.0, 20.0]])
    scores = jnp.array([[0.9, 0.0], [0.0, 0.8]])
    pred = jnp.concatenate([boxes, scores], axis=-1)[None]
    _, n = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45, max_det=10, in_format="a_no")
    assert int(n[0]) == 2
    _, n_ag = non_max_suppression(
        pred, conf_thres=0.25, iou_thres=0.45, max_det=10, class_agnostic=True, in_format="a_no"
    )
    assert int(n_ag[0]) == 1


def test_nms_matches_torchvision():
    torchvision = pytest.importorskip("torchvision")
    if type(torchvision).__name__ == "_Permissive":  # refstub fake leaked into sys.modules
        pytest.skip("torchvision is a parity stub, not the real library")
    import torch

    rng = np.random.default_rng(7)
    n = 60
    cxy = rng.uniform(40, 600, size=(n, 2))
    wh = rng.uniform(10, 80, size=(n, 2))
    conf = rng.uniform(0, 1, size=(n, 1))
    cls = rng.integers(0, 3, size=n)
    scores = np.zeros((n, 3), dtype=np.float32)
    scores[np.arange(n), cls] = conf[:, 0]
    pred = np.concatenate([cxy, wh, scores], axis=-1).astype(np.float32)

    dets, num = non_max_suppression(
        jnp.asarray(pred)[None], conf_thres=0.25, iou_thres=0.45, max_det=300, in_format="a_no"
    )
    dets = np.asarray(dets[0][: int(num[0])])

    # torchvision reference: batched_nms on the same candidates
    xyxy = np.asarray(xywh2xyxy(jnp.asarray(pred[:, :4])))
    mask = conf[:, 0] > 0.25
    keep = torchvision.ops.batched_nms(
        torch.from_numpy(xyxy[mask]).float(),
        torch.from_numpy(conf[mask, 0]).float(),
        torch.from_numpy(cls[mask]).long(),
        0.45,
    ).numpy()
    ref_boxes = xyxy[mask][keep]
    ref_scores = conf[mask, 0][keep]
    assert len(dets) == len(keep)
    np.testing.assert_allclose(dets[:, 4], ref_scores, atol=1e-6)
    np.testing.assert_allclose(dets[:, :4], ref_boxes, atol=1e-4)


def _greedy_nms_numpy(xyxy, scores, iou_thres):
    """Sequential greedy NMS — the exact semantics torchvision.ops.nms
    implements (keep highest score, drop overlaps, repeat)."""
    order = np.argsort(-scores, kind="stable")
    keep, alive = [], np.ones(len(scores), dtype=bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        x1 = np.maximum(xyxy[i, 0], xyxy[:, 0])
        y1 = np.maximum(xyxy[i, 1], xyxy[:, 1])
        x2 = np.minimum(xyxy[i, 2], xyxy[:, 2])
        y2 = np.minimum(xyxy[i, 3], xyxy[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = lambda b: (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
        iou = inter / (area(xyxy[i]) + area(xyxy) - inter + 1e-12)
        alive &= iou <= iou_thres
    return np.array(keep, dtype=np.int64)


def test_nms_matches_sequential_greedy_dense_chains():
    """Stress the fixpoint rewrite (junk rows seeded dead + MXU matvec,
    ops/nms.py::_suppress): 800 candidates in tight clusters so greedy
    suppression chains run deep, ~70% below conf_thres so the junk-seeding
    shortcut is actually load-bearing. Must equal sequential greedy NMS
    (torchvision semantics, numpy oracle) exactly."""
    rng = np.random.default_rng(11)
    n = 800
    # 8 cluster centers; every box jitters around one -> heavy overlap
    centers = rng.uniform(100, 540, size=(8, 2))
    cxy = centers[rng.integers(0, 8, size=n)] + rng.normal(0, 12, size=(n, 2))
    wh = rng.uniform(30, 60, size=(n, 2))
    conf = rng.uniform(0, 1, size=(n, 1)) * rng.uniform(0, 0.5, size=(n, 1)) * 2
    cls = rng.integers(0, 3, size=n)
    scores = np.zeros((n, 3), dtype=np.float32)
    scores[np.arange(n), cls] = conf[:, 0]
    pred = np.concatenate([cxy, wh, scores], axis=-1).astype(np.float32)

    dets, num = non_max_suppression(
        jnp.asarray(pred)[None], conf_thres=0.3, iou_thres=0.45,
        max_det=300, pre_nms_topk=1024, in_format="a_no",
    )
    dets = np.asarray(dets[0][: int(num[0])])

    xyxy = np.asarray(xywh2xyxy(jnp.asarray(pred[:, :4])))
    mask = conf[:, 0] > 0.3
    assert mask.sum() < 0.5 * n  # the junk-seeding path is exercised
    # class-offset trick makes per-class NMS a single agnostic pass
    offset = cls[mask, None].astype(np.float32) * 7680.0
    keep = _greedy_nms_numpy(xyxy[mask] + offset, conf[mask, 0], 0.45)
    assert len(dets) == len(keep)
    np.testing.assert_allclose(dets[:, 4], conf[mask, 0][keep], atol=1e-6)
    np.testing.assert_allclose(dets[:, :4], xyxy[mask][keep], atol=1e-4)


def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets and unit mask, deform_conv2d == plain convolution."""
    from yolo_dbl_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)).astype(np.float32))
    b, h, wd, c = x.shape
    offset = jnp.zeros((b, 8, 8, 2 * 9))
    out = deform_conv2d(x, offset, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_deform_conv_integer_shift():
    """Integer offsets shift the sampling grid exactly."""
    from yolo_dbl_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, 2, 3)).astype(np.float32))
    # dy=+1 for the single tap: output[i] should equal conv at input row i+1
    offset = jnp.zeros((1, 10, 10, 2)).at[..., 0].set(1.0)
    out = deform_conv2d(x, offset, w, stride=1, padding=0)
    ref = jnp.einsum("bhwc,co->bhwo", x, w[0, 0])
    np.testing.assert_allclose(np.asarray(out[:, :-1]), np.asarray(ref[:, 1:]), atol=1e-5)
    # last row samples outside -> zeros
    np.testing.assert_allclose(np.asarray(out[:, -1]), 0.0, atol=1e-6)


def test_deform_conv_mask_scales_output():
    from yolo_dbl_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 2)).astype(np.float32))
    offset = jnp.zeros((1, 6, 6, 18))
    half = jnp.full((1, 6, 6, 9), 0.5)
    out_full = deform_conv2d(x, offset, w, mask=jnp.ones((1, 6, 6, 9)), padding=1)
    out_half = deform_conv2d(x, offset, w, mask=half, padding=1)
    np.testing.assert_allclose(np.asarray(out_half), np.asarray(out_full) * 0.5, atol=1e-5)


def test_deform_conv_differentiable():
    from yolo_dbl_tpu.ops.deform_conv import deform_conv2d

    x = jnp.ones((1, 6, 6, 2))
    w = jnp.ones((3, 3, 2, 2)) * 0.1
    offset = jnp.zeros((1, 6, 6, 18))

    def loss(o, ww):
        return deform_conv2d(x, o, ww, padding=1).sum()

    go, gw = jax.grad(loss, argnums=(0, 1))(offset, w)
    assert np.isfinite(np.asarray(go)).all() and np.isfinite(np.asarray(gw)).all()
    assert float(jnp.abs(gw).sum()) > 0


def test_nms_fixpoint_matches_sequential_greedy():
    """The while-loop fixpoint in _suppress computes EXACT sequential greedy
    NMS (the semantics torchvision.ops.nms implements)."""
    import numpy as np

    from yolo_dbl_tpu.ops.boxes import box_iou
    from yolo_dbl_tpu.ops.nms import _suppress

    def greedy_np(boxes, scores, thr):
        k = len(boxes)
        iou = np.array(box_iou(jnp.array(boxes), jnp.array(boxes)))
        suppressed = np.zeros(k, bool)
        for i in range(k):
            if suppressed[i]:
                continue
            for j in range(i + 1, k):
                if iou[i, j] > thr:
                    suppressed[j] = True
        return ~suppressed & (scores > -np.inf)

    rng = np.random.default_rng(0)
    for trial in range(5):
        k = 200
        xy = rng.uniform(0, 100, (k, 2))
        wh = rng.uniform(5, 40, (k, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1].copy()
        # a few -inf rows at the tail, like masked candidates after top_k
        scores[-5:] = -np.inf
        ref = greedy_np(boxes, scores, 0.45)
        got = np.array(_suppress(jnp.array(boxes), jnp.array(scores), 0.45))
        assert (ref == got).all(), f"trial {trial}"
