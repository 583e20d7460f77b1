"""Classical detector zoo tests: RoIAlign, backbones, SSD priors/loss/decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.models import ssd as S
from yolo_dbl_tpu.models.backbones import FPN, ResNet50, VGG16Features
from yolo_dbl_tpu.ops.roi_align import multiscale_roi_align, roi_align


def naive_roi_align(feat, roi, out=(2, 2), scale=1.0, sr=2, aligned=True):
    """Independent numpy implementation straight from the RoIAlign definition."""
    h, w, c = feat.shape
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = roi
    x1, y1, x2, y2 = x1 * scale - off, y1 * scale - off, x2 * scale - off, y2 * scale - off
    bh, bw = (y2 - y1) / out[0], (x2 - x1) / out[1]
    res = np.zeros((*out, c))
    for i in range(out[0]):
        for j in range(out[1]):
            acc = np.zeros(c)
            for si in range(sr):
                for sj in range(sr):
                    y = y1 + (i + (si + 0.5) / sr) * bh
                    x = x1 + (j + (sj + 0.5) / sr) * bw
                    if y < -1 or y > h or x < -1 or x > w:
                        continue
                    y_, x_ = min(max(y, 0), h - 1), min(max(x, 0), w - 1)
                    y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                    y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                    wy, wx = y_ - y0, x_ - x0
                    v = (
                        feat[y0, x0] * (1 - wy) * (1 - wx)
                        + feat[y0, x1i] * (1 - wy) * wx
                        + feat[y1i, x0] * wy * (1 - wx)
                        + feat[y1i, x1i] * wy * wx
                    )
                    acc += v
            res[i, j] = acc / (sr * sr)
    return res


def test_roi_align_matches_naive():
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    rois = np.array([[0, 1.0, 1.0, 6.0, 5.0], [0, 0.0, 0.0, 8.0, 8.0]], np.float32)
    ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), (2, 2), 1.0, 2, True))
    for k in range(2):
        ref = naive_roi_align(feat[0], rois[k, 1:], (2, 2))
        np.testing.assert_allclose(ours[k], ref, atol=1e-5)


def test_roi_align_constant_region():
    feat = jnp.full((1, 16, 16, 4), 2.5)
    rois = jnp.array([[0, 2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, rois, (7, 7), 1.0, 2, True)
    np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-6)


def test_multiscale_roi_align_levels():
    # image 128 → P2..P5 at 32/16/8/4
    feats = [jnp.ones((1, 2 ** (5 - i), 2 ** (5 - i), 8)) * (i + 1) for i in range(4)]
    # FPN rule: level = floor(4 + log2(sqrt(area)/224)); 24px → P2, 112px → P3
    rois = jnp.array([[0, 0.0, 0.0, 24.0, 24.0], [0, 8.0, 8.0, 120.0, 120.0]])
    out = multiscale_roi_align(feats, rois, image_size=128)
    assert float(out[0].mean()) == pytest.approx(1.0)
    assert float(out[1].mean()) == pytest.approx(2.0)


def test_resnet50_feature_shapes():
    m = ResNet50()
    x = jnp.zeros((1, 64, 64, 3))
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
    feats = jax.eval_shape(lambda v: m.apply(v, x), shapes)
    assert feats["layer1"].shape == (1, 16, 16, 256)
    assert feats["layer2"].shape == (1, 8, 8, 512)
    assert feats["layer3"].shape == (1, 4, 4, 1024)
    assert feats["layer4"].shape == (1, 2, 2, 2048)


def test_ssd_priors_and_shapes():
    shapes = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    priors = S.default_boxes(shapes)
    expected = sum(h * w * n for (h, w), n in zip(shapes, S.SSD300_NUM_ANCHORS))
    assert priors.shape == (expected, 4)  # 8732 for SSD300
    assert expected == 8732
    assert float(priors[:, 2:].min()) > 0


def test_ssd_encode_decode_roundtrip():
    priors = S.default_boxes([(4, 4)], aspect_ratios=((2,),), scales=(0.2, 0.4))
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0.2, 0.8, (priors.shape[0], 4)).astype(np.float32))
    gt = gt.at[:, 2:].set(gt[:, :2] + 0.1)  # valid xyxy
    deltas = S.encode_boxes(gt, priors)
    back = S.decode_boxes(deltas, priors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-5)


def test_ssd_matcher_and_loss():
    priors = S.default_boxes([(8, 8), (4, 4)], aspect_ratios=((2,), (2,)), scales=(0.1, 0.3, 0.6))
    a = priors.shape[0]
    batch = {
        "gt_boxes": jnp.array([[[0.5, 0.5, 0.2, 0.2]], [[0.3, 0.3, 0.15, 0.15]]]),
        "gt_cls": jnp.zeros((2, 1), jnp.int32),
        "gt_mask": jnp.ones((2, 1)),
    }
    rng = jax.random.PRNGKey(0)
    cls_logits = jax.random.normal(rng, (2, a, 4)) * 0.01
    bbox_reg = jax.random.normal(rng, (2, a, 4)) * 0.01
    total, items = S.ssd_loss(cls_logits, bbox_reg, priors, batch, num_classes=4)
    assert np.isfinite(float(total)) and float(total) > 0
    # at least one positive per image (force matching)
    labels, matched, positive = S.match_priors(
        S.xywh2xyxy(priors), S.xywh2xyxy(batch["gt_boxes"][0]), jnp.array([1]), jnp.array([1.0])
    )
    assert int(positive.sum()) >= 1
    assert labels.max() == 1


def test_ssd_full_model_smoke():
    det = S.SSDDetector(num_classes=3, backbone="vgg16", image_size=300)
    v = jax.eval_shape(lambda: det.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3))))
    cls_logits, bbox_reg, feats = jax.eval_shape(
        lambda vv: det.module.apply(vv, jnp.zeros((1, 300, 300, 3)), return_feats=True), v
    )
    shapes = [f.shape[1:3] for f in feats]
    assert shapes == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    priors = S.default_boxes(shapes)
    assert priors.shape[0] == 8732
    assert cls_logits.shape == (1, 8732, 4)
    assert bbox_reg.shape == (1, 8732, 4)


@pytest.mark.compileheavy
def test_rtdetr_decoder_smoke():
    from yolo_dbl_tpu.models.rtdetr import RTDETRDecoder, rtdetr_postprocess

    feats = [
        jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 64)),
        jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64)),
        jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 64)),
    ]
    m = RTDETRDecoder(nc=5, ch=(64, 64, 64), hd=64, nq=20, ndl=2, nh=4)
    v = m.init(jax.random.PRNGKey(3), feats)
    dec_b, dec_s, enc_b, enc_s = m.apply(v, feats)
    assert dec_b.shape == (1, 2, 20, 4)
    assert dec_s.shape == (1, 2, 20, 5)
    assert float(dec_b.min()) >= 0 and float(dec_b.max()) <= 1
    dets = rtdetr_postprocess(dec_b, dec_s, img_size=128)
    assert dets.shape == (1, 20, 6)
    assert np.isfinite(np.asarray(dets)).all()
