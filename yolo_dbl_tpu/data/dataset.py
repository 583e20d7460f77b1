"""YOLO-format dataset (host side).

Equivalent of the reference's two dataset readers: global_utils/dataset.py:18
(YOLODataset for the classical zoo) and data/dataset.py:45 (the engine's
YOLODataset with label caching). Format: `images/*.jpg` + `labels/*.txt`
with lines `cls cx cy w h` normalized to [0, 1].

Labels are loaded once into memory (the tea-disease-scale datasets the
reference targets fit trivially); images are decoded per access with an
optional RAM cache like the reference's cache='ram' (data/base.py:93).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}


class YOLODataset:
    def __init__(self, root, split: str = "train", imgsz: int = 640, cache_images: bool = False,
                 names: Optional[Dict[int, str]] = None, img_dir=None):
        if img_dir is None and isinstance(root, (str, Path)) and str(root).endswith((".yaml", ".yml")):
            # dataset recipe yaml (reference data/utils.py check_det_dataset)
            from .utils import check_det_dataset

            info = check_det_dataset(root)
            img_dir = info["val"] if split in ("val", "test") and info["val"] else info["train"]
            root = info["root"]
            if names is None:
                names = info["names"]
        self.root = Path(root)
        if img_dir is not None:
            img_dir = Path(img_dir)
        else:
            img_dir = self.root / "images" / split
            if not img_dir.is_dir():
                img_dir = self.root / "images"
            if not img_dir.is_dir():
                img_dir = self.root / split / "images"
        if not img_dir.is_dir():
            raise FileNotFoundError(f"no images directory under {self.root}")
        self.im_files: List[Path] = sorted(
            p for p in img_dir.rglob("*") if p.suffix.lower() in IMG_EXTS
        )
        if not self.im_files:
            raise FileNotFoundError(f"no images found in {img_dir}")
        self.labels = [self._read_label(p) for p in self.im_files]
        self.imgsz = imgsz
        self.names = names or {}
        self._cache: Dict[int, np.ndarray] = {} if cache_images else None

    @staticmethod
    def _label_path(img_path: Path) -> Path:
        parts = list(img_path.parts)
        for i in range(len(parts) - 1, -1, -1):
            if parts[i] == "images":
                parts[i] = "labels"
                break
        return Path(*parts).with_suffix(".txt")

    def _read_label(self, img_path: Path) -> Dict:
        lp = self._label_path(img_path)
        boxes, cls = [], []
        if lp.is_file():
            for line in lp.read_text().splitlines():
                vals = line.split()
                if len(vals) >= 5:
                    cls.append(int(float(vals[0])))
                    boxes.append([float(v) for v in vals[1:5]])
        return {
            "xywhn": np.array(boxes, np.float32).reshape(-1, 4),
            "cls": np.array(cls, np.int32),
        }

    def __len__(self):
        return len(self.im_files)

    def load_image(self, index: int) -> np.ndarray:
        if self._cache is not None and index in self._cache:
            return self._cache[index]
        img = cv2.imread(str(self.im_files[index]))
        if img is None:
            raise IOError(f"failed to read {self.im_files[index]}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if self._cache is not None:
            self._cache[index] = img
        return img

    def load_resized(self, index: int, imgsz: int) -> Tuple[np.ndarray, Dict]:
        """Load + resize long side to imgsz (reference data/base.py load_image),
        labels converted to pixel xyxy."""
        img = self.load_image(index)
        h0, w0 = img.shape[:2]
        r = imgsz / max(h0, w0)
        if r != 1:
            img = cv2.resize(img, (round(w0 * r), round(h0 * r)), interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
        lab = self.labels[index]
        xywhn = lab["xywhn"]
        if len(xywhn):
            cx, cy, bw, bh = xywhn[:, 0] * w, xywhn[:, 1] * h, xywhn[:, 2] * w, xywhn[:, 3] * h
            boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=1).astype(np.float32)
        else:
            boxes = np.zeros((0, 4), np.float32)
        return img, {"boxes": boxes, "cls": lab["cls"].copy(), "orig_shape": (h0, w0)}
