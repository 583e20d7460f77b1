"""YOLO-format dataset (host side).

Equivalent of the reference's two dataset readers: global_utils/dataset.py:18
(YOLODataset for the classical zoo) and data/dataset.py:45 (the engine's
YOLODataset with label caching). Format: `images/*.jpg` + `labels/*.txt`
with lines `cls cx cy w h` normalized to [0, 1].

Labels are parsed once and persisted to a hash-validated `.cache` file next
to the labels directory (reference data/dataset.py:66 `cache_labels` /
data/utils.py:load_dataset_cache_file): reopening the dataset skips the
per-file parse when the (paths, sizes, mtimes) hash matches; a stale,
corrupt, or version-mismatched cache falls back to a full re-scan. Images
are decoded per access with an optional RAM cache like the reference's
cache='ram' (data/base.py:93).
"""

from __future__ import annotations

import hashlib
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}

# bump when the label dict layout changes (mirrors reference DATASET_CACHE_VERSION)
CACHE_VERSION = "yolo_dbl_tpu.cache.v1"


class YOLODataset:
    def __init__(self, root, split: str = "train", imgsz: int = 640, cache_images: bool = False,
                 names: Optional[Dict[int, str]] = None, img_dir=None, task: str = "detect"):
        self.task = task
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
        self.labels = self._load_labels()
        self.imgsz = imgsz
        self.names = names or {}
        self._cache: Dict[int, np.ndarray] = {} if cache_images else None

    # ---- persistent label cache (reference data/dataset.py:66) ----

    def _cache_path(self) -> Path:
        """<labels-dir>/<task>.cache beside the label files (reference puts
        it at `Path(label_files[0]).parent.with_suffix('.cache')`; keeping it
        inside the labels dir avoids clobbering sibling-split caches)."""
        return self._label_path(self.im_files[0]).parent / f".{self.task}.labels.cache"

    def _labels_hash(self) -> str:
        """Hash of every label file's (path, size, mtime) plus the image
        list and task — any added/removed/edited label invalidates."""
        h = hashlib.sha256(self.task.encode())
        for p in self.im_files:
            lp = self._label_path(p)
            try:
                st = lp.stat()
                h.update(f"{lp}|{st.st_size}|{st.st_mtime_ns};".encode())
            except OSError:
                h.update(f"{lp}|absent;".encode())
        return h.hexdigest()

    def _load_labels(self) -> List[Dict]:
        """Load labels from the .cache when its hash validates; otherwise
        parse every label file and (best-effort) write a fresh cache."""
        cache_path = self._cache_path()
        want_hash = self._labels_hash()
        if cache_path.is_file():
            try:
                with open(cache_path, "rb") as f:
                    cached = pickle.load(f)
                if (
                    cached.get("version") == CACHE_VERSION
                    and cached.get("hash") == want_hash
                    and len(cached.get("labels", [])) == len(self.im_files)
                ):
                    return cached["labels"]
            except Exception:
                pass  # corrupt/unreadable cache → re-scan
        labels = [self._read_label(p) for p in self.im_files]
        try:
            tmp = cache_path.with_suffix(".tmp")
            with open(tmp, "wb") as f:
                pickle.dump(
                    {"version": CACHE_VERSION, "hash": want_hash, "labels": labels}, f
                )
            tmp.replace(cache_path)  # atomic: readers never see a partial file
        except OSError:
            pass  # read-only dataset dir — cache is an optimization only
        return labels

    @staticmethod
    def _label_path(img_path: Path) -> Path:
        parts = list(img_path.parts)
        for i in range(len(parts) - 1, -1, -1):
            if parts[i] == "images":
                parts[i] = "labels"
                break
        return Path(*parts).with_suffix(".txt")

    def _read_label(self, img_path: Path) -> Dict:
        """Parse one YOLO label file by task (reference data/utils.py
        verify_image_label): detect `cls xywh`; segment `cls poly…`; pose
        `cls xywh (x y v)×K`; obb `cls x1 y1 … x4 y4` (DOTA corners)."""
        lp = self._label_path(img_path)
        boxes, cls, segs, kpts = [], [], [], []
        if lp.is_file():
            for line in lp.read_text().splitlines():
                vals = [float(v) for v in line.split()]
                if len(vals) < 5:
                    continue
                cls.append(int(vals[0]))
                if self.task == "segment":
                    poly = np.array(vals[1:], np.float32).reshape(-1, 2)
                    segs.append(poly)
                    x1, y1 = poly.min(0)
                    x2, y2 = poly.max(0)
                    boxes.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                elif self.task == "pose":
                    boxes.append(vals[1:5])
                    kpts.append(np.array(vals[5:], np.float32).reshape(-1, 3))
                elif self.task == "obb":
                    pts = np.array(vals[1:9], np.float32).reshape(4, 2)
                    (cx, cy), (bw, bh), ang = cv2.minAreaRect(pts)
                    boxes.append([cx, cy, bw, bh, np.deg2rad(ang)])
                else:
                    boxes.append(vals[1:5])
        ncol = 5 if self.task == "obb" else 4
        out = {
            "xywhn": np.array(boxes, np.float32).reshape(-1, ncol),
            "cls": np.array(cls, np.int32),
        }
        if self.task == "segment":
            out["segments"] = segs
        elif self.task == "pose":
            out["keypoints"] = (np.stack(kpts) if kpts else
                                np.zeros((0, 17, 3), np.float32))
        return out

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
        extra = {}
        if self.task == "segment":
            extra["segments"] = [p * np.array([w, h], np.float32) for p in lab.get("segments", [])]
        elif self.task == "pose":
            kp = lab.get("keypoints", np.zeros((0, 17, 3), np.float32)).copy()
            kp[..., 0] *= w
            kp[..., 1] *= h
            extra["keypoints"] = kp
        elif self.task == "obb":
            extra["rboxes"] = lab["xywhn"].copy()  # normalized xywhr
        return img, {"boxes": boxes, "cls": lab["cls"].copy(), "orig_shape": (h0, w0), **extra}
