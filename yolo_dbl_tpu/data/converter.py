"""Dataset converters (host-side).

Equivalent of the reference's data/converter.py (COCO→YOLO label
conversion) and data/split_dota.py (tile splitting for large aerial
images). The SAM auto-annotator (data/annotator.py) is deferred until the
SAM family lands.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple


def convert_coco(
    annotations_json: str,
    save_dir: str,
    use_segments: bool = False,
    cls91to80: bool = False,
) -> Path:
    """COCO json → YOLO txt labels (reference data/converter.py convert_coco).

    Writes labels/<image_stem>.txt with `cls cx cy w h` normalized rows.
    """
    save_dir = Path(save_dir)
    (save_dir / "labels").mkdir(parents=True, exist_ok=True)
    with open(annotations_json) as f:
        data = json.load(f)

    images = {im["id"]: im for im in data["images"]}
    cat_ids = sorted(c["id"] for c in data.get("categories", []))
    cat_map = {cid: i for i, cid in enumerate(cat_ids)}
    per_image: Dict[int, List] = defaultdict(list)
    for ann in data["annotations"]:
        if ann.get("iscrowd", 0):
            continue
        per_image[ann["image_id"]].append(ann)

    for img_id, anns in per_image.items():
        im = images[img_id]
        w, h = im["width"], im["height"]
        lines = []
        for ann in anns:
            x, y, bw, bh = ann["bbox"]  # ltwh
            cx, cy = (x + bw / 2) / w, (y + bh / 2) / h
            cls = cat_map[ann["category_id"]]
            if use_segments and ann.get("segmentation"):
                seg = ann["segmentation"][0]
                pts = " ".join(
                    f"{px / w:.6f} {py / h:.6f}" for px, py in zip(seg[::2], seg[1::2])
                )
                lines.append(f"{cls} {pts}")
            else:
                lines.append(f"{cls} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
        stem = Path(im["file_name"]).stem
        (save_dir / "labels" / f"{stem}.txt").write_text("\n".join(lines))
    return save_dir


def yolo_to_coco_gt(dataset, names: Optional[Dict[int, str]] = None) -> Dict:
    """In-memory COCO GT dict from a YOLODataset (reference
    global_utils/coco.py:23 convert_to_coco_api) — enables COCO-format
    round-trips and json dumps."""
    images, annotations, categories = [], [], []
    names = names or getattr(dataset, "names", {}) or {}
    ann_id = 1
    cls_seen = set()
    for idx in range(len(dataset)):
        img, lab = dataset.load_resized(idx, dataset.imgsz)
        h0, w0 = lab["orig_shape"]
        images.append({"id": idx, "width": w0, "height": h0,
                       "file_name": dataset.im_files[idx].name})
        scale_back = max(h0, w0) / max(img.shape[:2])
        for box, cls in zip(lab["boxes"], lab["cls"]):
            x1, y1, x2, y2 = (float(v) * scale_back for v in box)
            annotations.append({
                "id": ann_id, "image_id": idx, "category_id": int(cls),
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": (x2 - x1) * (y2 - y1), "iscrowd": 0,
            })
            cls_seen.add(int(cls))
            ann_id += 1
    for c in sorted(cls_seen):
        categories.append({"id": c, "name": names.get(c, str(c))})
    return {"images": images, "annotations": annotations, "categories": categories}


def split_images_into_tiles(
    image, tile: int = 1024, overlap: float = 0.2
) -> List[Tuple[Tuple[int, int], "object"]]:
    """Tile a large image with overlap (reference data/split_dota.py core).
    Returns [((x0, y0), tile_image)]."""
    h, w = image.shape[:2]
    step = max(1, int(tile * (1 - overlap)))
    tiles = []
    ys = list(range(0, max(h - tile, 0) + 1, step)) or [0]
    xs = list(range(0, max(w - tile, 0) + 1, step)) or [0]
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)
    for y0 in ys:
        for x0 in xs:
            tiles.append(((x0, y0), image[y0 : y0 + tile, x0 : x0 + tile]))
    return tiles
