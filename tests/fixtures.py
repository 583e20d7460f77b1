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


def make_task_dataset(root, task="segment", n_train=4, n_val=2, imgsz=160, seed=0, kpt=17):
    """Shapes dataset with task labels: segment = polygon rows, pose =
    box + K keypoint triplets, obb = 4-corner rows (DOTA style)."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in [("train", n_train), ("val", n_val)]:
        img_dir = root / "images" / split
        lab_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lab_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.full((imgsz, imgsz, 3), 64, np.uint8)
            rows = []
            for _ in range(rng.integers(1, 3)):
                cx, cy = rng.uniform(0.3, 0.7, 2)
                w, h = rng.uniform(0.15, 0.3, 2)
                cls = int(rng.integers(0, 2))
                x1, y1, x2, y2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
                cv2.rectangle(img, (int(x1 * imgsz), int(y1 * imgsz)),
                              (int(x2 * imgsz), int(y2 * imgsz)), (200, 50, 50), -1)
                if task == "segment":
                    poly = [x1, y1, x2, y1, x2, y2, x1, y2]
                    rows.append(f"{cls} " + " ".join(f"{v:.4f}" for v in poly))
                elif task == "pose":
                    kpts = []
                    for _k in range(kpt):
                        kx = rng.uniform(x1, x2)
                        ky = rng.uniform(y1, y2)
                        kpts += [kx, ky, 2.0]
                    rows.append(f"{cls} {cx:.4f} {cy:.4f} {w:.4f} {h:.4f} "
                                + " ".join(f"{v:.4f}" for v in kpts))
                elif task == "obb":
                    rows.append(f"{cls} {x1:.4f} {y1:.4f} {x2:.4f} {y1:.4f} "
                                f"{x2:.4f} {y2:.4f} {x1:.4f} {y2:.4f}")
            cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
            (lab_dir / f"im{i}.txt").write_text("\n".join(rows) + "\n")
    return root
