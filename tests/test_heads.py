"""Multi-task head tests: Segment/Pose/OBB/Classify + mask decode."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dbl_tpu.nn.heads import OBB, Classify, Pose, Proto, Segment, decode_masks


FEATS = [
    jax.random.normal(jax.random.PRNGKey(i), (1, s, s, c))
    for i, (s, c) in enumerate([(8, 64), (4, 128), (2, 256)])
]


def test_segment_head_shapes():
    m = Segment(nc=3, nm=32, npr=64, ch=(64, 128, 256))
    v = m.init(jax.random.PRNGKey(0), FEATS)
    det, coeffs, protos = m.apply(v, FEATS)
    assert len(det) == 3 and det[0].shape == (1, 8, 8, 64 + 3)
    assert [c.shape[-1] for c in coeffs] == [32, 32, 32]
    assert protos.shape == (1, 16, 16, 32)  # 2x upsample of P3


def test_pose_head_shapes():
    m = Pose(nc=1, kpt_shape=(17, 3), ch=(64, 128, 256))
    v = m.init(jax.random.PRNGKey(0), FEATS)
    det, kpts = m.apply(v, FEATS)
    assert kpts[0].shape == (1, 8, 8, 51)


def test_obb_head_angle_range():
    m = OBB(nc=3, ch=(64, 128, 256))
    v = m.init(jax.random.PRNGKey(0), FEATS)
    det, angles = m.apply(v, FEATS)
    a = np.concatenate([np.asarray(x).ravel() for x in angles])
    assert (a >= -np.pi / 4 - 1e-6).all() and (a <= 3 * np.pi / 4 + 1e-6).all()


def test_classify_head():
    m = Classify(10)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 10)


def test_decode_masks_crops_outside_box():
    coeffs = jnp.ones((1, 4))
    protos = jnp.ones((8, 8, 4)) * 3.0  # sigmoid(12) ≈ 1
    boxes = jnp.array([[16.0, 16.0, 48.0, 48.0]])  # middle of a 64px image
    masks = np.asarray(decode_masks(coeffs, protos, boxes, (64, 64)))
    assert masks[0, 3, 3] > 0.9  # inside box (mask coords 2..6)
    assert masks[0, 0, 0] == 0.0  # outside box zeroed


def test_segment_yaml_builds():
    from yolo_dbl_tpu.nn.tasks import parse_model_spec, yaml_model_load

    d = yaml_model_load("yolov8n-seg.yaml")
    spec = parse_model_spec(d, ch=3)
    assert spec.layers[-1].name == "Segment"
