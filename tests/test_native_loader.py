"""Native C++ data-loader core (yolo_dbl_tpu/native): decode + letterbox +
collate parity against the Python/cv2 path, and the DataLoader fast lane.

The native core replaces the reference's torch-DataLoader C++ worker pool +
cv2 native imread/resize (reference data/build.py:135, data/base.py
load_image, augment.py:1477 LetterBox) for the eval/predict path.
"""

import os

import numpy as np
import pytest

from yolo_dbl_tpu.data.augment import letterbox
from yolo_dbl_tpu.data.build import DataLoader
from yolo_dbl_tpu.data.dataset import YOLODataset
from yolo_dbl_tpu.native import loader as native

from .fixtures import make_shapes_dataset

pytestmark = pytest.mark.skipif(
    not native.is_available(),
    reason=f"native loader unavailable: {native.build_error()}",
)


@pytest.fixture(scope="module")
def shapes_root(tmp_path_factory):
    return make_shapes_dataset(tmp_path_factory.mktemp("nshapes"), n_train=6,
                               n_val=6, imgsz=160)


def _random_image(h, w, seed=0):
    return (np.random.default_rng(seed).random((h, w, 3)) * 255).astype(np.uint8)


def test_decode_jpeg_matches_libjpeg(tmp_path):
    from PIL import Image

    img = _random_image(211, 173)
    p = tmp_path / "a.jpg"
    Image.fromarray(img).save(p, quality=90)
    nat = native.decode_file(p)
    ref = np.asarray(Image.open(p).convert("RGB"))  # PIL wraps the same libjpeg
    assert nat is not None and nat.shape == ref.shape
    np.testing.assert_array_equal(nat, ref)


def test_decode_png_exact(tmp_path):
    from PIL import Image

    img = _random_image(64, 97, seed=1)
    p = tmp_path / "b.png"
    Image.fromarray(img).save(p)
    nat = native.decode_file(p)
    np.testing.assert_array_equal(nat, img)

    # grayscale + palette PNGs normalize to RGB
    Image.fromarray(img[..., 0]).save(tmp_path / "g.png")
    g = native.decode_file(tmp_path / "g.png")
    assert g.shape == (64, 97, 3)
    np.testing.assert_array_equal(g[..., 0], g[..., 1])


def test_decode_failure_returns_none(tmp_path):
    assert native.decode_file(tmp_path / "missing.jpg") is None
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8not a real jpeg")
    assert native.decode_file(bad) is None


@pytest.mark.parametrize("shape", [(100, 200), (333, 487), (640, 640), (50, 30)])
def test_letterbox_parity(shape):
    """Same geometry (gain/pad exact) as data/augment.py letterbox; pixels
    within 2 LSB of cv2.INTER_LINEAR (fixed-point vs float rounding)."""
    img = _random_image(*shape, seed=shape[0])
    out, g, pad = native.letterbox_u8(img, 320)
    ref, rg, rpad = letterbox(img, (320, 320))
    assert g == pytest.approx(rg, rel=1e-6)
    assert pad == (float(rpad[0]), float(rpad[1]))
    assert out.shape == ref.shape
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 2
    assert diff.mean() < 0.25


def test_letterbox_no_scaleup():
    img = _random_image(60, 80)
    out, g, pad = native.letterbox_u8(img, 320, scaleup=False)
    ref, rg, rpad = letterbox(img, (320, 320), scaleup=False)
    assert g == rg == 1.0
    assert pad == (float(rpad[0]), float(rpad[1]))
    np.testing.assert_array_equal(out, ref)  # pure pad, no resample


def test_batch_decode_letterbox(tmp_path):
    from PIL import Image

    paths = []
    for i, (h, w) in enumerate([(120, 200), (300, 150), (90, 90)]):
        p = tmp_path / f"im{i}.png"  # png: native decode is bit-exact
        Image.fromarray(_random_image(h, w, seed=i)).save(p)
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.png"))

    pool = native.NativePool(3)
    try:
        out, gains, pads, hw, status = pool.decode_letterbox_batch(paths, 160)
        assert out.shape == (4, 160, 160, 3)
        assert list(status) == [0, 0, 0, 1]
        assert hw[0].tolist() == [120, 200] and hw[1].tolist() == [300, 150]
        # each good slot equals the single-image native letterbox
        for i, (h, w) in enumerate([(120, 200), (300, 150), (90, 90)]):
            one, g1, p1 = native.letterbox_u8(
                _random_image(h, w, seed=i), 160, scaleup=False)
            assert gains[i] == pytest.approx(g1)
            np.testing.assert_array_equal(out[i], one)
        # failed slot is solid padding
        assert (out[3] == 114).all()
    finally:
        pool.close()


def test_dataloader_native_val_lane_matches_python(shapes_root):
    """The DataLoader eval fast lane (native decode+letterbox+collate) agrees
    with the Python ValTransforms path: identical GT padding/classes, boxes
    within 1 px (one resample vs the two-stage load_resized→letterbox), and
    images close enough that detection outputs are unaffected."""
    ds = YOLODataset(shapes_root, split="val", imgsz=160)
    dl = DataLoader(ds, batch_size=6, imgsz=160, augment=False,
                    drop_last=False, prefetch=0)
    native_batch = next(iter(dl._make_batches()))
    assert dl._native not in (None, False), "native lane did not engage"
    dl.close()

    os.environ["YOLO_DBL_NATIVE_LOADER"] = "0"
    try:
        dl2 = DataLoader(ds, batch_size=6, imgsz=160, augment=False,
                         drop_last=False, prefetch=0)
        py_batch = next(iter(dl2._make_batches()))
        assert dl2._native in (None, False)
    finally:
        os.environ.pop("YOLO_DBL_NATIVE_LOADER")

    assert native_batch["img"].shape == py_batch["img"].shape
    assert native_batch["img"].dtype == np.uint8
    np.testing.assert_array_equal(native_batch["gt_cls"], py_batch["gt_cls"])
    np.testing.assert_array_equal(native_batch["gt_mask"], py_batch["gt_mask"])
    np.testing.assert_allclose(
        native_batch["gt_boxes"], py_batch["gt_boxes"], atol=1.5 / 160)
    for ln, lp in zip(native_batch["labels"], py_batch["labels"]):
        assert ln["orig_shape"] == lp["orig_shape"]
        np.testing.assert_allclose(ln["boxes"], lp["boxes"], atol=1.5)
    # images: same geometry; pixel tolerance covers the resample difference
    diff = np.abs(native_batch["img"].astype(int) - py_batch["img"].astype(int))
    assert np.mean(diff) < 4.0


def test_dataloader_native_lane_off_for_train(shapes_root):
    ds = YOLODataset(shapes_root, split="train", imgsz=160)
    dl = DataLoader(ds, batch_size=4, imgsz=160, augment=True, prefetch=0)
    _ = next(iter(dl._make_batches()))
    assert dl._native is None  # train path never touches the native lane
    dl.close()
