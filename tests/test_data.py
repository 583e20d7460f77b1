"""Data pipeline tests: dataset reading, letterbox, mosaic, batch format."""

import numpy as np
import pytest

from yolo_dbl_tpu.data.augment import (
    TrainTransforms,
    ValTransforms,
    apply_letterbox_to_boxes,
    letterbox,
    mosaic4,
)
from yolo_dbl_tpu.data.build import DataLoader, format_batch
from yolo_dbl_tpu.data.dataset import YOLODataset

from .fixtures import make_shapes_dataset


@pytest.fixture(scope="module")
def shapes_root(tmp_path_factory):
    return make_shapes_dataset(tmp_path_factory.mktemp("shapes"), n_train=8, n_val=4, imgsz=160)


def test_dataset_reads_labels(shapes_root):
    ds = YOLODataset(shapes_root, split="train", imgsz=160)
    assert len(ds) == 8
    img, lab = ds.load_resized(0, 160)
    assert img.shape == (160, 160, 3)
    assert lab["boxes"].shape[1] == 4
    assert len(lab["boxes"]) == len(lab["cls"]) >= 1
    # boxes are pixel xyxy within bounds
    assert lab["boxes"].min() >= 0 and lab["boxes"].max() <= 160


def test_letterbox_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    out, gain, pad = letterbox(img, (64, 64))
    assert out.shape == (64, 64, 3)
    assert gain == pytest.approx(64 / 200)
    boxes = np.array([[0.0, 0.0, 200.0, 100.0]])
    lb = apply_letterbox_to_boxes(boxes, gain, pad)
    assert lb[0, 0] == pytest.approx(pad[0])
    assert lb[0, 2] == pytest.approx(pad[0] + 64)


def test_mosaic_and_train_transforms(shapes_root):
    ds = YOLODataset(shapes_root, split="train", imgsz=160)
    rng = np.random.default_rng(0)
    items = [ds.load_resized(i % len(ds), 160) for i in range(4)]
    canvas, labels = mosaic4(items, 160, rng)
    assert canvas.shape == (320, 320, 3)
    assert len(labels["boxes"]) >= 4  # at least one box per tile
    tt = TrainTransforms(imgsz=160, hyp={"mosaic": 1.0, "fliplr": 0.5})
    img, lab = tt(ds, 0, rng)
    assert img.shape == (160, 160, 3)
    assert (lab["boxes"] >= 0).all() and (lab["boxes"] <= 160).all()


def test_dataloader_batches(shapes_root):
    ds = YOLODataset(shapes_root, split="train", imgsz=160)
    dl = DataLoader(ds, batch_size=4, imgsz=160, augment=True, max_gt=16, prefetch=0)
    batch = next(iter(dl))
    assert batch["img"].shape == (4, 160, 160, 3)
    # uint8 contract: batches ship at 1/4 the bytes; train/val steps run
    # device_normalize (kernels/preprocess.py) — see test_trainer_scan.py
    assert batch["img"].dtype == np.uint8
    assert batch["gt_boxes"].shape == (4, 16, 4)
    assert batch["gt_mask"].sum() >= 4
    # normalized xywh within [0, 1]
    m = batch["gt_mask"].astype(bool)
    assert batch["gt_boxes"][m].min() >= 0 and batch["gt_boxes"][m].max() <= 1.0


def test_dataloader_worker_pool(shapes_root):
    """workers>1 fans decode+augment over a thread pool: same batch contract,
    and deterministic for a fixed (seed, epoch) — two pooled runs agree."""
    ds = YOLODataset(shapes_root, split="train", imgsz=160)

    def run():
        dl = DataLoader(ds, batch_size=4, imgsz=160, augment=True, max_gt=16,
                        prefetch=0, seed=7, workers=4)
        return next(iter(dl))

    a, b = run(), run()
    assert a["img"].shape == (4, 160, 160, 3) and a["img"].dtype == np.uint8
    np.testing.assert_array_equal(a["img"], b["img"])
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
    np.testing.assert_array_equal(a["indices"], b["indices"])


def test_val_loader_keeps_metadata(shapes_root):
    ds = YOLODataset(shapes_root, split="val", imgsz=160)
    dl = DataLoader(ds, batch_size=4, imgsz=160, augment=False, drop_last=False, prefetch=0)
    batch = next(iter(dl))
    assert "labels" in batch
    assert "ratio_pad" in batch["labels"][0]


def test_multi_scale_and_rect_buckets():
    from yolo_dbl_tpu.data.rect import (
        multi_scale_sizes,
        rect_group_indices,
        rect_shapes,
        resize_batch,
        sample_scale,
    )

    sizes = multi_scale_sizes(640, 32)
    assert all(s % 32 == 0 for s in sizes)
    assert min(sizes) >= 320 and max(sizes) <= 960
    rng = np.random.default_rng(0)
    assert sample_scale(sizes, rng) in sizes
    img = np.zeros((2, 160, 160, 3), np.float32)
    assert resize_batch(img, 96).shape == (2, 96, 96, 3)

    ars = [0.5, 0.6, 1.0, 1.8, 2.0, 1.0]
    shapes = rect_shapes(ars, 640, 32)
    assert all(h % 32 == 0 and w % 32 == 0 for h, w in shapes)
    batches = rect_group_indices(ars, 640, batch_size=2)
    covered = sorted(i for idxs, _ in batches for i in idxs)
    assert covered == list(range(6))


def test_visualization_suite(shapes_root, tmp_path):
    from yolo_dbl_tpu.data.visualize import (
        TEA_CLASS_NAMES,
        display_images,
        image_split,
        label_image_tea,
        transform_visualization,
    )

    ds = YOLODataset(shapes_root, split="train", imgsz=160)
    demo = transform_visualization(ds, 0, imgsz=160)
    assert set(demo) == {"original", "mosaic", "hsv", "scale", "fliplr", "mixup"}
    assert demo["mosaic"].shape[0] == 320
    display_images(demo, save_path=str(tmp_path / "aug.png"))
    assert (tmp_path / "aug.png").exists()
    img = label_image_tea(np.zeros((100, 100, 3), np.uint8), np.array([[0.5, 0.5, 0.4, 0.4]]), [1])
    assert img.sum() > 0
    tiles = image_split(np.zeros((100, 100, 3), np.uint8), 2, 2)
    assert len(tiles) == 4 and tiles[0].shape == (50, 50, 3)
    assert len(TEA_CLASS_NAMES) == 3


def test_inference_loaders(shapes_root, tmp_path):
    import cv2

    from yolo_dbl_tpu.data.loaders import (
        LoadImagesAndVideos,
        LoadPilAndNumpy,
        LoadTensor,
        load_inference_source,
    )

    img_dir = shapes_root / "images" / "train"
    loader = LoadImagesAndVideos(img_dir)
    items = list(loader)
    assert len(items) == 8
    path, frame = items[0]
    assert frame.ndim == 3 and frame.shape[2] == 3

    # tiny video
    vid = tmp_path / "clip.mp4"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 64))
    for _ in range(6):
        wr.write(np.zeros((64, 64, 3), np.uint8))
    wr.release()
    frames = list(LoadImagesAndVideos(vid, vid_stride=2))
    assert len(frames) == 3

    arr = np.zeros((2, 32, 32, 3), np.uint8)
    assert len(list(LoadTensor(arr))) == 2
    assert len(list(LoadPilAndNumpy([arr[0], arr[1]]))) == 2
    assert isinstance(load_inference_source(str(img_dir)), LoadImagesAndVideos)


def test_dataset_yaml_recipe(tmp_path):
    """check_det_dataset resolves recipe yamls; YOLODataset loads through one."""
    import yaml as _yaml

    from yolo_dbl_tpu.data.dataset import YOLODataset
    from yolo_dbl_tpu.data.utils import check_det_dataset
    from .fixtures import make_shapes_dataset

    root = tmp_path / "shapes"
    make_shapes_dataset(root, n_train=4, n_val=2, imgsz=96)
    recipe = tmp_path / "shapes.yaml"
    recipe.write_text(_yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/val",
        "names": {0: "circle", 1: "square", 2: "triangle"},
    }))
    info = check_det_dataset(recipe)
    assert info["nc"] == 3 and info["names"][1] == "square"
    assert info["train"].is_dir() and info["val"].is_dir()
    ds = YOLODataset(str(recipe), split="val", imgsz=96)
    assert len(ds) == 2 and ds.names[2] == "triangle"
    # bundled recipes parse (data itself not present in this image)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        check_det_dataset("coco8.yaml")
    # a directory still resolves like before
    d2 = check_det_dataset(root)
    assert d2["train"].is_dir()


def test_copy_paste_flip_mode(tmp_path):
    """copy_paste=0.15 (the DBL recipe) actually changes batches: mirrored
    segments are pasted, instances grow (reference augment.py:1634)."""
    from yolo_dbl_tpu.data.augment import bbox_ioa, copy_paste
    from .fixtures import make_task_dataset

    root = make_task_dataset(tmp_path / "segshapes", task="segment", n_train=4, imgsz=160)
    ds = YOLODataset(root, split="train", imgsz=160, task="segment")
    rng = np.random.default_rng(3)
    img, labels = ds.load_resized(0, 160)
    # place objects off-center so the mirrored copies don't overlap > 0.30 IoA
    n0 = len(labels["boxes"])
    img2, lab2 = copy_paste(img, labels, rng, p=1.0, mode="flip")
    assert len(lab2["boxes"]) > n0, "flip copy-paste must add instances"
    assert len(lab2["segments"]) == len(lab2["boxes"]) == len(lab2["cls"])
    # pasted pixels come from the mirrored image
    assert not np.array_equal(img, img2)
    # donor boxes are the mirror of eligible originals
    w = img.shape[1]
    mirrored = labels["boxes"].copy()
    mirrored[:, [0, 2]] = w - labels["boxes"][:, [2, 0]]
    new = lab2["boxes"][n0:]
    for nb in new:
        assert any(np.allclose(nb, mb, atol=1e-3) for mb in mirrored)
    # IoA gate: every pasted box overlaps each original by < 0.30
    ioa = bbox_ioa(new, labels["boxes"])
    assert (ioa < 0.30).all()


def test_copy_paste_noop_without_segments():
    from yolo_dbl_tpu.data.augment import copy_paste

    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 3), np.uint8)
    labels = {"boxes": np.array([[8.0, 8.0, 24.0, 24.0]], np.float32),
              "cls": np.array([0], np.int32)}
    img2, lab2 = copy_paste(img, labels, rng, p=1.0)
    assert img2 is img and lab2 is labels  # detect-only datasets: no-op


def test_copy_paste_mixup_mode(tmp_path):
    from yolo_dbl_tpu.data.augment import copy_paste
    from .fixtures import make_task_dataset

    root = make_task_dataset(tmp_path / "segshapes2", task="segment", n_train=4, imgsz=160, seed=7)
    ds = YOLODataset(root, split="train", imgsz=160, task="segment")
    rng = np.random.default_rng(1)
    img, labels = ds.load_resized(0, 160)
    donor_img, donor_labels = ds.load_resized(1, 160)
    n0 = len(labels["boxes"])
    img2, lab2 = copy_paste(img, labels, rng, p=1.0, mode="mixup", donor=(donor_img, donor_labels))
    assert len(lab2["boxes"]) >= n0
    assert len(lab2["segments"]) == len(lab2["boxes"])


def test_train_transforms_carry_segments(tmp_path):
    """Segment task now trains with the full mosaic/affine chain; segments
    follow the geometry and stay consistent with boxes."""
    from .fixtures import make_task_dataset

    root = make_task_dataset(tmp_path / "segshapes3", task="segment", n_train=4, imgsz=160)
    ds = YOLODataset(root, split="train", imgsz=160, task="segment")
    rng = np.random.default_rng(0)
    tt = TrainTransforms(imgsz=160, hyp={"mosaic": 1.0, "copy_paste": 0.5, "scale": 0.5})
    for i in range(4):
        img, lab = tt(ds, i, rng)
        assert img.shape == (160, 160, 3)
        assert len(lab["segments"]) == len(lab["boxes"]) == len(lab["cls"])
        for seg, box in zip(lab["segments"], lab["boxes"]):
            assert seg[:, 0].min() >= box[0] - 1.5 and seg[:, 0].max() <= box[2] + 1.5
            assert seg[:, 1].min() >= box[1] - 1.5 and seg[:, 1].max() <= box[3] + 1.5


def test_segment_dataloader_augmented_masks(tmp_path):
    from .fixtures import make_task_dataset

    root = make_task_dataset(tmp_path / "segshapes4", task="segment", n_train=4, imgsz=160)
    ds = YOLODataset(root, split="train", imgsz=160, task="segment")
    dl = DataLoader(ds, batch_size=2, imgsz=160, augment=True, max_gt=8,
                    hyp={"mosaic": 1.0, "copy_paste": 0.3}, prefetch=0)
    batch = next(iter(dl))
    assert batch["gt_masks"].shape == (2, 8, 40, 40)
    n_valid = int(batch["gt_mask"].sum())
    assert n_valid >= 1
    # every valid instance has a non-empty rasterized mask
    per_inst = batch["gt_masks"].reshape(2 * 8, -1).sum(1)
    valid = batch["gt_mask"].reshape(-1) > 0
    assert (per_inst[valid] > 0).mean() > 0.8


def test_bgr_and_erasing(tmp_path):
    from yolo_dbl_tpu.data.augment import random_erasing

    root = make_shapes_dataset(tmp_path / "shapes_bgr", n_train=2, n_val=1, imgsz=96)
    ds = YOLODataset(root, split="train", imgsz=96)
    rng = np.random.default_rng(0)
    tt = TrainTransforms(imgsz=96, hyp={"mosaic": 0.0, "bgr": 1.0, "hsv_h": 0, "hsv_s": 0,
                                        "hsv_v": 0, "fliplr": 0, "scale": 0, "translate": 0})
    img_aug, _ = tt(ds, 0, rng)
    tt0 = TrainTransforms(imgsz=96, hyp={"mosaic": 0.0, "bgr": 0.0, "hsv_h": 0, "hsv_s": 0,
                                         "hsv_v": 0, "fliplr": 0, "scale": 0, "translate": 0})
    img_plain, _ = tt0(ds, 0, np.random.default_rng(0))
    assert np.array_equal(img_aug, img_plain[:, :, ::-1])  # bgr=1.0 reverses channels

    img = np.full((64, 64, 3), 128, np.uint8)
    erased = random_erasing(img, np.random.default_rng(1), p=1.0)
    assert not np.array_equal(img, erased)
    assert np.array_equal(img, random_erasing(img, np.random.default_rng(1), p=0.0))


def test_albumentations_extras_shapes_and_determinism():
    """Pixel extras (blur/median/gray/CLAHE) keep shape/dtype; p=0 is identity;
    forced-p transforms actually change pixels (reference augment.py:1735)."""
    import numpy as np

    from yolo_dbl_tpu.data.augment import albumentations_extras

    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    out = albumentations_extras(img.copy(), np.random.default_rng(0), p=0.0)
    assert np.array_equal(out, img)
    out = albumentations_extras(img.copy(), np.random.default_rng(0), p=1.0)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert not np.array_equal(out, img)
    # gray branch forces channel equality when applied alone
    g = albumentations_extras(img.copy(), np.random.default_rng(3), p=1.0)
    assert g.shape == (64, 64, 3)


def test_label_cache_roundtrip_and_invalidation(tmp_path):
    """Persistent .cache (reference data/dataset.py:66): a second open skips
    parsing; mutating a label file invalidates the cache; a corrupt cache
    falls back to a full re-scan."""
    from unittest import mock

    root = make_shapes_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=96)
    ds1 = YOLODataset(root, split="train", imgsz=96)
    cache = ds1._cache_path()
    assert cache.is_file()

    # second open: labels come from the cache, _read_label never called
    with mock.patch.object(YOLODataset, "_read_label",
                           side_effect=AssertionError("cache miss")) as m:
        ds2 = YOLODataset(root, split="train", imgsz=96)
    assert m.call_count == 0
    for a, b in zip(ds1.labels, ds2.labels):
        assert np.array_equal(a["xywhn"], b["xywhn"])
        assert np.array_equal(a["cls"], b["cls"])

    # mutate one label file -> hash changes -> full re-parse, new content seen
    lp = ds1._label_path(ds1.im_files[0])
    lp.write_text("2 0.500000 0.500000 0.250000 0.250000\n")
    import os
    os.utime(lp, ns=(os.stat(lp).st_atime_ns, os.stat(lp).st_mtime_ns + 10**9))
    ds3 = YOLODataset(root, split="train", imgsz=96)
    assert ds3.labels[0]["cls"].tolist() == [2]
    assert np.allclose(ds3.labels[0]["xywhn"][0], [0.5, 0.5, 0.25, 0.25])

    # corrupt cache -> graceful re-scan
    ds3._cache_path().write_bytes(b"not a pickle")
    ds4 = YOLODataset(root, split="train", imgsz=96)
    assert len(ds4.labels) == 4
    assert ds4.labels[0]["cls"].tolist() == [2]


def test_disk_image_cache_spill_and_budget(tmp_path, caplog):
    """cache='disk' (reference data/base.py:93-101): decoded images spill to
    .npy beside each image; later reads come from the spill (the original can
    even disappear); the budget check refuses caching when the dataset won't
    fit, with a warning instead of an OOM."""
    import logging
    from unittest import mock

    root = make_shapes_dataset(tmp_path / "ds", n_train=4, n_val=2, imgsz=96)
    ds = YOLODataset(root, split="train", imgsz=96, cache_images="disk")
    assert ds._disk_cache and ds._cache is None
    first = ds.load_image(0)
    npy = ds._npy_path(0)
    assert npy.is_file()
    # second read comes from the spill: decode path never runs
    with mock.patch("cv2.imread", side_effect=AssertionError("spill miss")):
        again = ds.load_image(0)
    np.testing.assert_array_equal(first, again)
    # spilled array round-trips exactly and is non-executable on load
    np.testing.assert_array_equal(np.load(npy, allow_pickle=False), first)
    # a truncated spill falls back to decoding the original
    npy.write_bytes(b"\x93NUMPY garbage")
    np.testing.assert_array_equal(ds.load_image(0), first)

    # RAM-mode alias: True == 'ram' (dict cache, no .npy writes)
    ds_ram = YOLODataset(root, split="train", imgsz=96, cache_images=True)
    assert ds_ram._cache == {} and not ds_ram._disk_cache
    ds_ram.load_image(1)
    assert 1 in ds_ram._cache

    # budget refusal: pretend the disk is full -> caching disabled loudly
    from yolo_dbl_tpu.utils import LOGGER

    LOGGER.addHandler(caplog.handler)
    try:
        with caplog.at_level(logging.WARNING, logger="yolo_dbl_tpu"):
            import shutil as _sh

            usage = _sh.disk_usage(".")._replace(free=0)
            with mock.patch("shutil.disk_usage", return_value=usage):
                ds_no = YOLODataset(root, split="train", imgsz=96, cache_images="disk")
        assert not ds_no._disk_cache and ds_no._cache is None
        assert any("caching disabled" in r.message for r in caplog.records)
    finally:
        LOGGER.removeHandler(caplog.handler)
