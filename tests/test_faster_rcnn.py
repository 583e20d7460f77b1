"""Faster R-CNN component tests: anchors, RPN targets, sampling, loss smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.models import faster_rcnn as F
from yolo_dbl_tpu.ops.boxes import xywh2xyxy


def test_anchor_generation():
    anchors = F.generate_anchors([(8, 8), (4, 4)], [4, 8])
    assert anchors[0].shape == (8 * 8 * 3, 4)
    # size-32 anchors at ratio 1 are 32x32 squares
    a0 = np.asarray(anchors[0][1])  # ratio 1.0 is second
    assert a0[2] - a0[0] == pytest.approx(32.0)
    assert a0[3] - a0[1] == pytest.approx(32.0)


def test_rpn_target_assignment():
    anchors = jnp.array(
        [[0.0, 0.0, 32.0, 32.0], [100.0, 100.0, 132.0, 132.0], [6.0, 6.0, 38.0, 38.0]]
    )
    gt = jnp.array([[0.0, 0.0, 30.0, 30.0]])
    labels, matched, pos_sel, neg_sel = F.assign_rpn_targets(
        anchors, gt, jnp.array([1.0]), rng=jax.random.PRNGKey(0)
    )
    assert labels[0] == 1.0  # high IoU
    assert labels[1] == 0.0  # no overlap
    assert bool(pos_sel.any()) and bool(neg_sel.any())
    np.testing.assert_allclose(np.asarray(matched[0]), [0, 0, 30, 30])


def test_roi_sampling_fixed_shape():
    rng = jax.random.PRNGKey(0)
    proposals = jax.random.uniform(rng, (64, 4)) * 100
    proposals = jnp.concatenate([proposals[:, :2], proposals[:, :2] + 20], axis=1)
    valid = jnp.ones((64,), bool)
    gt = jnp.array([[10.0, 10.0, 40.0, 40.0]])
    boxes, labels, matched, mask = F.sample_rois(
        proposals, valid, gt, jnp.array([2]), jnp.array([1.0]), rng, batch_size=32
    )
    assert boxes.shape == (32, 4) and labels.shape == (32,)
    # GT itself was appended → at least one positive with label 2
    assert int((labels == 2).sum()) >= 1


@pytest.mark.compileheavy
def test_faster_rcnn_loss_smoke():
    det = F.FasterRCNN(num_classes=3, image_size=128)
    rng = jax.random.PRNGKey(0)
    v = det.init(rng)
    batch = {
        "img": jnp.zeros((1, 128, 128, 3)),
        "gt_boxes": jnp.array([[[0.5, 0.5, 0.4, 0.4]]]),
        "gt_cls": jnp.zeros((1, 1), jnp.int32),
        "gt_mask": jnp.ones((1, 1)),
    }
    total, items, aux = det.loss(v, batch, rng, train=True, mutable=["batch_stats"])
    assert "batch_stats" in aux
    assert np.isfinite(float(total))
    assert set(items) == {"loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg"}
    for k, val in items.items():
        assert np.isfinite(float(val)), k


def test_faster_rcnn_predict_smoke():
    det = F.FasterRCNN(num_classes=3, image_size=128)
    v = det.init(jax.random.PRNGKey(0))
    dets, num = det.predict(v, jnp.zeros((1, 128, 128, 3)))
    assert dets.shape == (1, 100, 6)
    assert int(num[0]) >= 0
