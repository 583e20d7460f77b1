"""Fast R-CNN / R-CNN / selective-search tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.data.proposals import create_training_samples, felzenszwalb, selective_search
from yolo_dbl_tpu.models import fast_rcnn as FR
from yolo_dbl_tpu.models import rcnn as R


def _toy_image():
    img = np.full((64, 64, 3), 40, np.uint8)
    img[10:30, 10:30] = [220, 60, 60]
    img[40:60, 35:60] = [60, 220, 60]
    return img


def test_felzenszwalb_segments_regions():
    labels = felzenszwalb(_toy_image(), scale=100, min_size=20)
    assert labels.shape == (64, 64)
    assert labels.max() >= 2  # bg + 2 shapes


def test_selective_search_proposals():
    rects = selective_search(_toy_image(), max_proposals=100)
    assert rects.ndim == 2 and rects.shape[1] == 4
    assert len(rects) >= 3
    # xywh positive sizes
    assert (rects[:, 2] > 0).all() and (rects[:, 3] > 0).all()
    # some proposal overlaps the first square reasonably
    xyxy = np.stack([rects[:, 0], rects[:, 1], rects[:, 0] + rects[:, 2], rects[:, 1] + rects[:, 3]], 1)
    from yolo_dbl_tpu.utils.metrics import box_iou_np

    iou = box_iou_np(xyxy, np.array([[10.0, 10.0, 30.0, 30.0]]))
    assert iou.max() > 0.5


def test_create_training_samples():
    proposals = np.array([[10.0, 10.0, 30.0, 30.0], [12.0, 12.0, 32.0, 32.0], [50.0, 50.0, 60.0, 60.0]])
    gt = np.array([[10.0, 10.0, 30.0, 30.0]])
    pos, neg, labels, targets = create_training_samples(proposals, gt, np.array([1]))
    assert len(pos) == 2 and len(neg) == 1
    assert (labels == 2).all()  # +1 shift
    np.testing.assert_allclose(targets[0], 0.0, atol=1e-6)  # perfect match → zero deltas


def test_fast_rcnn_proposals_and_targets():
    gt = np.array([[20.0, 20.0, 60.0, 60.0]], np.float32)
    props = FR.make_train_proposals(gt, 128, num_samples=16, rng=np.random.default_rng(0))
    assert props.shape == (16, 4)
    labels, targets = FR.compute_targets(props, gt, np.array([1]), num_classes=4)
    assert labels.shape == (16,)
    assert labels[0] == 1  # the GT proposal itself is positive
    np.testing.assert_allclose(targets[0], 0.0, atol=1e-5)
    # regression roundtrip through apply_regression
    boxes = FR.apply_regression(jnp.asarray(props), jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(boxes[0]), gt[0], atol=1e-4)


def test_fast_rcnn_model_smoke():
    m = FR.FastRCNN(num_classes=4)
    x = jnp.zeros((1, 64, 64, 3))
    rois = jnp.array([[0, 4.0, 4.0, 40.0, 40.0], [0, 8.0, 8.0, 60.0, 60.0]])
    v = m.init(jax.random.PRNGKey(0), x, rois)
    scores, deltas = m.apply(v, x, rois)
    assert scores.shape == (2, 4) and deltas.shape == (2, 4)
    labels = jnp.array([1, 3])
    targets = jnp.zeros((2, 4))
    total, items = FR.fast_rcnn_loss(scores, deltas, labels, targets, 4)
    assert np.isfinite(float(total))


def test_rcnn_model_and_loss():
    m = R.RCNN(num_classes=3)
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    scores, deltas = m.apply(v, x)
    assert scores.shape == (2, 4) and deltas.shape == (2, 12)
    total, items = R.rcnn_loss(scores, deltas, jnp.array([0, 2]), jnp.zeros((2, 4)), 3)
    assert np.isfinite(float(total))


def test_rcnn_preprocess_pipeline():
    img = _toy_image()
    gt = np.array([[10.0, 10.0, 30.0, 30.0]])
    out = R.preprocess_image(img, gt, np.array([0]), max_proposals=200)
    assert "positive_rois" in out and "negative_rois" in out
    assert len(out["positive_rois"]) + len(out["negative_rois"]) > 0
