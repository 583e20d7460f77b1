"""data/converter.py: COCO→YOLO label conversion, YOLO→COCO GT round-trip,
DOTA-style tiling (reference data/converter.py convert_coco,
global_utils/coco.py:23 convert_to_coco_api, data/split_dota.py)."""

import json

import numpy as np
import pytest

from yolo_dbl_tpu.data.converter import (
    convert_coco,
    split_images_into_tiles,
    yolo_to_coco_gt,
)


def _coco_fixture(tmp_path, iscrowd=0, segmentation=None):
    ann = {
        "id": 1, "image_id": 7, "category_id": 20,
        "bbox": [10.0, 20.0, 30.0, 40.0], "iscrowd": iscrowd,
    }
    if segmentation is not None:
        ann["segmentation"] = segmentation
    data = {
        "images": [{"id": 7, "width": 200, "height": 100,
                    "file_name": "imgs/pic_007.jpg"}],
        "annotations": [ann],
        "categories": [{"id": 20, "name": "cow"}, {"id": 5, "name": "cat"}],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(data))
    return p


def test_convert_coco_boxes(tmp_path):
    p = _coco_fixture(tmp_path)
    out = convert_coco(str(p), str(tmp_path / "yolo"))
    txt = (out / "labels" / "pic_007.txt").read_text().strip().split()
    # category 20 is the 2nd sorted id (5, 20) → class index 1
    assert txt[0] == "1"
    cx, cy, w, h = map(float, txt[1:])
    # ltwh (10,20,30,40) in a 200x100 image → center (25,40), norm by (w,h)
    assert np.allclose([cx, cy, w, h], [25 / 200, 40 / 100, 30 / 200, 40 / 100],
                       atol=1e-6)


def test_convert_coco_skips_crowd_and_writes_segments(tmp_path):
    crowd = _coco_fixture(tmp_path, iscrowd=1)
    out = convert_coco(str(crowd), str(tmp_path / "y1"))
    # crowd-only image produces no label file (annotation filtered)
    assert not (out / "labels" / "pic_007.txt").exists()

    seg = _coco_fixture(tmp_path, segmentation=[[10.0, 20.0, 40.0, 20.0, 40.0, 60.0]])
    out = convert_coco(str(seg), str(tmp_path / "y2"), use_segments=True)
    row = (out / "labels" / "pic_007.txt").read_text().strip().split()
    assert row[0] == "1" and len(row) == 1 + 6  # cls + 3 normalized xy points
    xs, ys = list(map(float, row[1::2])), list(map(float, row[2::2]))
    assert np.allclose(xs, [10 / 200, 40 / 200, 40 / 200], atol=1e-6)
    assert np.allclose(ys, [20 / 100, 20 / 100, 60 / 100], atol=1e-6)


def test_yolo_to_coco_gt_roundtrip(tmp_path):
    """convert_coco → YOLODataset → yolo_to_coco_gt recovers the original
    pixel-space box within letterbox rounding."""
    cv2 = pytest.importorskip("cv2")
    p = _coco_fixture(tmp_path)
    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    convert_coco(str(p), str(root))
    cv2.imwrite(str(root / "images" / "pic_007.jpg"),
                np.full((100, 200, 3), 127, np.uint8))

    from yolo_dbl_tpu.data.dataset import YOLODataset

    ds = YOLODataset(str(root), img_dir=str(root / "images"), imgsz=64)
    gt = yolo_to_coco_gt(ds, names={1: "cow"})
    assert [im["file_name"] for im in gt["images"]] == ["pic_007.jpg"]
    (ann,) = gt["annotations"]
    assert ann["category_id"] == 1
    x, y, w, h = ann["bbox"]
    assert np.allclose([x, y, w, h], [10, 20, 30, 40], atol=2.0)
    assert gt["categories"] == [{"id": 1, "name": "cow"}]


def test_split_images_into_tiles_covers_and_overlaps():
    img = np.arange(300 * 500).reshape(300, 500).astype(np.int32)
    tiles = split_images_into_tiles(img, tile=256, overlap=0.25)
    # full coverage: every pixel appears in at least one tile
    seen = np.zeros_like(img, dtype=bool)
    for (x0, y0), t in tiles:
        assert t.shape[0] <= 256 and t.shape[1] <= 256
        np.testing.assert_array_equal(t, img[y0:y0 + t.shape[0], x0:x0 + t.shape[1]])
        seen[y0:y0 + t.shape[0], x0:x0 + t.shape[1]] = True
    assert seen.all()
    # trailing tiles are flush with the image border, not clipped short
    xs = sorted({x0 for (x0, _), _ in tiles})
    assert xs[-1] == 500 - 256

    # image smaller than the tile: single whole-image tile
    small = np.ones((50, 60), np.uint8)
    tiles = split_images_into_tiles(small, tile=256)
    assert len(tiles) == 1 and tiles[0][0] == (0, 0) and tiles[0][1].shape == (50, 60)
