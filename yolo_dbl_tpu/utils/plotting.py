"""Plotting suite: annotator, batch mosaics, training curves.

Equivalent of the reference's utils/plotting.py (Annotator, plot_images
batch mosaics, plot_results curves, feature_visualization:1348 — the latter
lives in harness/features.py). cv2/matplotlib, host-side only.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

_PALETTE = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29), (207, 210, 49),
    (72, 249, 10), (146, 204, 23), (61, 219, 134), (26, 147, 52), (0, 212, 187),
    (44, 153, 168), (0, 194, 255), (52, 69, 147), (100, 115, 255), (0, 24, 236),
    (132, 56, 255), (82, 0, 133), (203, 56, 255), (255, 149, 200), (255, 55, 199),
]


def color_for(cls: int):
    return _PALETTE[int(cls) % len(_PALETTE)]


class Annotator:
    """Box/label drawing on one image (reference plotting.py Annotator)."""

    def __init__(self, im: np.ndarray, line_width: Optional[int] = None):
        import cv2

        self.im = np.ascontiguousarray(im)
        self.lw = line_width or max(round(sum(im.shape[:2]) / 2 * 0.003), 2)
        self._cv2 = cv2

    def box_label(self, box, label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255)):
        cv2 = self._cv2
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.im, p1, p2, color, self.lw, cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            wt, ht = cv2.getTextSize(label, 0, self.lw / 3, tf)[0]
            outside = p1[1] - ht >= 3
            p2t = (p1[0] + wt, p1[1] - ht - 3 if outside else p1[1] + ht + 3)
            cv2.rectangle(self.im, p1, p2t, color, -1, cv2.LINE_AA)
            cv2.putText(
                self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + ht + 2),
                0, self.lw / 3, txt_color, tf, cv2.LINE_AA,
            )

    def result(self):
        return self.im


def plot_images(
    images: np.ndarray,
    batch_boxes: Sequence[np.ndarray],
    batch_cls: Sequence[np.ndarray],
    names: Optional[Dict[int, str]] = None,
    max_images: int = 16,
    save_path: Optional[str] = None,
):
    """Grid mosaic of a batch with boxes (reference plotting.py plot_images).

    images: (B, H, W, 3) float [0,1] or uint8; boxes per image in pixel xyxy.
    """
    import cv2

    n = min(len(images), max_images)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w = images.shape[1:3]
    canvas = np.full((rows * h, cols * w, 3), 114, np.uint8)
    names = names or {}
    for i in range(n):
        im = images[i]
        if im.dtype != np.uint8:
            im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        r, c = divmod(i, cols)
        ann = Annotator(im.copy())
        for box, cls in zip(batch_boxes[i], batch_cls[i]):
            ann.box_label(box, names.get(int(cls), str(int(cls))), color_for(cls))
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = ann.result()
    if save_path:
        cv2.imwrite(str(save_path), cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return canvas


def plot_results(history: List[Dict], save_path: Optional[str] = None):
    """Loss/metric curves over epochs (reference plotting.py plot_results)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = [k for k in history[0] if isinstance(history[0][k], (int, float)) and k not in ("epoch", "seconds")]
    cols = min(len(keys), 4)
    rows = int(np.ceil(len(keys) / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows), squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        ax.plot([e.get(k, np.nan) for e in history])
        ax.set_title(k, fontsize=9)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
    return fig
