"""Synthetic YOLO-format detection dataset for tests (coco8-style fixture).

Draws filled shapes of 3 classes on noise backgrounds so a small model can
overfit quickly: class 0 = bright box, 1 = bright circle, 2 = dark box.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def make_shapes_dataset(root, n_train=8, n_val=4, imgsz=160, seed=0, max_objects=3):
    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in [("train", n_train), ("val", n_val)]:
        img_dir = root / "images" / split
        lab_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lab_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.integers(30, 70, (imgsz, imgsz, 3), dtype=np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, max_objects + 1))):
                cls = int(rng.integers(0, 3))
                w = int(rng.integers(imgsz // 8, imgsz // 3))
                h = int(rng.integers(imgsz // 8, imgsz // 3))
                cx = int(rng.integers(w // 2 + 2, imgsz - w // 2 - 2))
                cy = int(rng.integers(h // 2 + 2, imgsz - h // 2 - 2))
                x1, y1, x2, y2 = cx - w // 2, cy - h // 2, cx + w // 2, cy + h // 2
                if cls == 0:
                    cv2.rectangle(img, (x1, y1), (x2, y2), (230, 200, 60), -1)
                elif cls == 1:
                    cv2.circle(img, (cx, cy), min(w, h) // 2, (60, 220, 220), -1)
                else:
                    cv2.rectangle(img, (x1, y1), (x2, y2), (10, 10, 120), -1)
                lines.append(f"{cls} {cx/imgsz:.6f} {cy/imgsz:.6f} {w/imgsz:.6f} {h/imgsz:.6f}")
            cv2.imwrite(str(img_dir / f"im{i:03d}.jpg"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            (lab_dir / f"im{i:03d}.txt").write_text("\n".join(lines))
    return root
