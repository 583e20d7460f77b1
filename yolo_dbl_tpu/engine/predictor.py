"""Prediction engine + Results containers.

Equivalent of the reference's BasePredictor.stream_inference
(engine/predictor.py:64,220) and Results/Boxes (engine/results.py:187,938):
letterbox preprocess on host, jitted forward + decode + NMS on device, box
rescale to original resolution, lightweight Results object.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import letterbox
from ..nn.tasks import DetectionModel
from ..ops.nms import non_max_suppression


@dataclass
class Boxes:
    """Detection box container (reference results.py:938)."""

    data: np.ndarray  # (n, 6) [x1, y1, x2, y2, conf, cls]

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.stack(
            [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1
        )

    def __len__(self):
        return len(self.data)


@dataclass
class Results:
    """Per-image inference result (reference results.py:187)."""

    boxes: Boxes
    orig_shape: tuple
    path: Optional[str] = None
    names: Dict[int, str] = field(default_factory=dict)

    def __len__(self):
        return len(self.boxes)

    def to_json_dicts(self) -> List[Dict]:
        out = []
        for row in self.boxes.data:
            out.append(
                {
                    "name": self.names.get(int(row[5]), str(int(row[5]))),
                    "class": int(row[5]),
                    "confidence": float(row[4]),
                    "box": {"x1": float(row[0]), "y1": float(row[1]), "x2": float(row[2]), "y2": float(row[3])},
                }
            )
        return out

    def plot(self, img: Optional[np.ndarray] = None, color=(255, 64, 64)):
        """Draw boxes on the original image (cv2)."""
        import cv2

        canvas = img.copy() if img is not None else np.zeros((*self.orig_shape, 3), np.uint8)
        for row in self.boxes.data:
            x1, y1, x2, y2 = (int(v) for v in row[:4])
            cv2.rectangle(canvas, (x1, y1), (x2, y2), color, 2)
            label = f"{self.names.get(int(row[5]), int(row[5]))} {row[4]:.2f}"
            cv2.putText(canvas, label, (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        return canvas


class DetectionPredictor:
    def __init__(self, model: DetectionModel, conf: float = 0.25, iou: float = 0.45,
                 max_det: int = 300, imgsz: int = 640):
        self.model = model
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.imgsz = imgsz

        def infer(variables, img):
            pred = model.predict(variables, img)
            return non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det
            )

        self._infer = jax.jit(infer)

    def _load(self, source) -> List[np.ndarray]:
        import cv2

        if isinstance(source, (str, Path)):
            p = Path(source)
            paths = sorted(p.glob("*")) if p.is_dir() else [p]
            imgs, names = [], []
            for f in paths:
                im = cv2.imread(str(f))
                if im is not None:
                    imgs.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB))
                    names.append(str(f))
            return imgs, names
        if isinstance(source, np.ndarray):
            return [source], [None]
        return list(source), [None] * len(list(source))

    def __call__(self, variables, source, batch_size: int = 16) -> List[Results]:
        images, paths = self._load(source)
        results: List[Results] = []
        for start in range(0, len(images), batch_size):
            chunk = images[start : start + batch_size]
            lb = [letterbox(im, (self.imgsz, self.imgsz), scaleup=False) for im in chunk]
            batch = np.stack([b[0] for b in lb]).astype(np.float32) / 255.0
            dets, num = jax.device_get(self._infer(variables, jnp.asarray(batch)))
            for i, im in enumerate(chunk):
                k = int(num[i])
                d = np.asarray(dets[i][:k], dtype=np.float64)
                gain, pad = lb[i][1], lb[i][2]
                d[:, [0, 2]] = (d[:, [0, 2]] - pad[0]) / gain
                d[:, [1, 3]] = (d[:, [1, 3]] - pad[1]) / gain
                h, w = im.shape[:2]
                d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
                d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
                results.append(
                    Results(Boxes(d), orig_shape=(h, w), path=paths[start + i], names=self.model.names)
                )
        return results
