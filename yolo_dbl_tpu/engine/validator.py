"""Validation engine: jitted inference + NMS, host-side metric accumulation.

Equivalent of the reference's BaseValidator/DetectionValidator
(engine/validator.py:40, models/yolo/detect/val.py:31): batched jit
inference with on-device decode + fixed-shape NMS, per-stage timing, then
DetMetrics / COCO 12-stat on the host. Detections stream back asynchronously
(device_get happens after the next batch is dispatched).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.build import DataLoader
from ..nn.tasks import DetectionModel
from ..ops.boxes import scale_boxes
from ..ops.nms import non_max_suppression
from ..utils.metrics import COCOEvaluator, DetMetrics


class DetectionValidator:
    def __init__(self, model: DetectionModel, conf: float = 0.001, iou: float = 0.7,
                 max_det: int = 300, use_coco_stats: bool = False):
        self.model = model
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.use_coco_stats = use_coco_stats

        def infer(variables, img):
            pred = model.predict(variables, img)
            return non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det
            )

        self._infer = jax.jit(infer)

    def __call__(self, variables, loader: DataLoader, max_batches: Optional[int] = None) -> Dict:
        metrics = DetMetrics(self.model.nc, self.model.names)
        coco = COCOEvaluator(self.model.nc) if self.use_coco_stats else None
        speed = {"inference": 0.0, "postprocess": 0.0}
        n_images = 0
        pending = None  # overlap device compute with host metric accumulation

        def consume(res, batch):
            nonlocal n_images
            t0 = time.time()
            dets, num = jax.device_get(res)
            labels = batch.get("labels")
            imgsz = batch["img"].shape[1]
            for i in range(len(dets)):
                k = int(num[i])
                d = dets[i][:k]
                if labels is not None:
                    gt = labels[i]
                    gt_boxes, gt_cls = gt["boxes"], gt["cls"]
                else:
                    m = batch["gt_mask"][i].astype(bool)
                    from ..ops.boxes import xywh2xyxy

                    gt_boxes = np.asarray(xywh2xyxy(jnp.asarray(batch["gt_boxes"][i][m] * imgsz)))
                    gt_cls = batch["gt_cls"][i][m]
                metrics.update(d, np.asarray(gt_boxes), np.asarray(gt_cls))
                if coco is not None:
                    coco.update(d, np.asarray(gt_boxes), np.asarray(gt_cls))
                n_images += 1
            speed["postprocess"] += time.time() - t0

        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            t0 = time.time()
            res = self._infer(variables, jnp.asarray(batch["img"]))
            if pending is not None:
                consume(*pending)
            jax.block_until_ready(res)
            speed["inference"] += time.time() - t0
            pending = (res, batch)
        if pending is not None:
            consume(*pending)

        out = metrics.results()
        if coco is not None:
            out["coco_stats"] = coco.summarize()
        out["speed_ms_per_image"] = {
            k: (v / max(n_images, 1)) * 1000 for k, v in speed.items()
        }
        out["images"] = n_images
        return out
