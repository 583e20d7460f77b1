"""Label/augmentation visualization (host side).

Equivalent of the reference's global_utils visualization pieces:
label_image / label_image_tea with the tea-disease preset
(global_utils/dataset.py:136,182) and the augmentation demo generator
(global_utils/transforms.py:60 transform_visualization, :120 display_images,
:51 image_split).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# tea-disease preset (reference global_utils/dataset.py:185)
TEA_CLASS_NAMES = {0: "algal leaf spot", 1: "brown blight", 2: "grey blight"}
TEA_CLASS_COLORS = {0: (219, 80, 60), 1: (139, 86, 51), 2: (128, 128, 128)}


def label_image(image: np.ndarray, boxes_xywhn: np.ndarray, classes: Sequence[int],
                names: Optional[Dict[int, str]] = None,
                colors: Optional[Dict[int, Tuple[int, int, int]]] = None) -> np.ndarray:
    """Draw YOLO-format normalized labels on an image (reference dataset.py:136)."""
    import cv2

    img = np.ascontiguousarray(image.copy())
    h, w = img.shape[:2]
    names = names or {}
    colors = colors or {}
    for box, cls in zip(boxes_xywhn, classes):
        cx, cy, bw, bh = box
        x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
        x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
        color = colors.get(int(cls), (255, 64, 64))
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        label = names.get(int(cls), str(int(cls)))
        cv2.putText(img, label, (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return img


def label_image_tea(image, boxes_xywhn, classes):
    """Tea-disease preset wrapper (reference dataset.py:182)."""
    return label_image(image, boxes_xywhn, classes, TEA_CLASS_NAMES, TEA_CLASS_COLORS)


def image_split(image: np.ndarray, rows: int = 2, cols: int = 2) -> List[np.ndarray]:
    """Split an image into a grid of tiles (reference transforms.py:51)."""
    h, w = image.shape[:2]
    th, tw = h // rows, w // cols
    return [image[r * th : (r + 1) * th, c * tw : (c + 1) * tw] for r in range(rows) for c in range(cols)]


def transform_visualization(dataset, index: int = 0, imgsz: int = 320, seed: int = 0) -> Dict[str, np.ndarray]:
    """Produce demo images of each augmentation (reference transforms.py:60):
    mosaic / HSV / scale / flips / mixup on one sample."""
    from .augment import mosaic4, mixup, random_flip, random_hsv, random_perspective

    rng = np.random.default_rng(seed)
    img, labels = dataset.load_resized(index, imgsz)
    out = {"original": img}
    items = [dataset.load_resized((index + i) % len(dataset), imgsz) for i in range(4)]
    mos, mos_lab = mosaic4(items, imgsz, rng)
    out["mosaic"] = mos
    out["hsv"] = random_hsv(img.copy(), rng, 0.05, 0.7, 0.4)
    warped, _ = random_perspective(img.copy(), dict(labels), rng, scale=0.5)
    out["scale"] = warped
    flipped, _ = random_flip(img.copy(), dict(labels), rng, fliplr=1.0)
    out["fliplr"] = flipped
    j = (index + 1) % len(dataset)
    img2, labels2 = dataset.load_resized(j, imgsz)
    mixed, _ = mixup(img, dict(labels), img2, dict(labels2), rng)
    out["mixup"] = mixed
    return out


def display_images(images: Dict[str, np.ndarray], save_path: Optional[str] = None):
    """Grid plot of named images (reference transforms.py:120)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    cols = min(n, 3)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows), squeeze=False)
    for ax, (name, img) in zip(axes.ravel(), images.items()):
        ax.imshow(img)
        ax.set_title(name, fontsize=10)
        ax.axis("off")
    for ax in axes.ravel()[n:]:
        ax.axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    return fig
