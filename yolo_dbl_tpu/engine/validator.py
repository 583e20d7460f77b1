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
                 max_det: int = 300, use_coco_stats: bool = False,
                 save_json: bool = False, save_dir=None):
        self.model = model
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.use_coco_stats = use_coco_stats
        # reference pred_to_json (models/yolo/detect/val.py:281): dump every
        # detection as COCO-format rows to predictions.json
        self.save_json = save_json
        self.save_dir = save_dir

        def infer(variables, img):
            from ..kernels.preprocess import device_normalize

            img = device_normalize(img)  # uint8 val batches /255 on device
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
        json_rows = [] if self.save_json else None
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
                if json_rows is not None:
                    # COCO result rows (reference pred_to_json): xyxy → ltwh,
                    # coordinates in the validator's letterboxed input space
                    # (the same space the mAP above is computed in)
                    for row in d:
                        json_rows.append({
                            "image_id": n_images,
                            "category_id": int(row[5]),
                            "bbox": [round(float(v), 3) for v in
                                     (row[0], row[1], row[2] - row[0], row[3] - row[1])],
                            "score": round(float(row[4]), 5),
                        })
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
        if json_rows is not None:
            import json
            from pathlib import Path

            save_dir = Path(self.save_dir or "runs/val")
            save_dir.mkdir(parents=True, exist_ok=True)
            (save_dir / "predictions.json").write_text(json.dumps(json_rows))
            out["predictions_json"] = str(save_dir / "predictions.json")
        out["speed_ms_per_image"] = {
            k: (v / max(n_images, 1)) * 1000 for k, v in speed.items()
        }
        out["images"] = n_images
        return out


class SegmentationValidator:
    """Box + mask mAP (reference models/yolo/segment/val.py): NMS-kept
    coefficients combine with prototypes at proto resolution and compare to
    the loader's rasterized gt_masks (same resolution by construction)."""

    def __init__(self, model: DetectionModel, conf: float = 0.001, iou: float = 0.7,
                 max_det: int = 300):
        from ..nn.heads import flatten_levels

        self.model = model
        self.conf, self.iou, self.max_det = conf, iou, max_det

        def infer(variables, img):
            from ..kernels.preprocess import device_normalize

            img = device_normalize(img)  # uint8 val batches /255 on device
            outputs = model.apply(variables, img)
            det_maps, coeffs, protos = outputs
            pred = model.decode_outputs(outputs, img_size=img.shape[1])
            dets, num, anchor_idx = non_max_suppression(
                pred, conf_thres=conf, iou_thres=iou, max_det=max_det,
                nc=model.nc, return_idx=True)
            kept = jnp.take_along_axis(flatten_levels(coeffs), anchor_idx[..., None], axis=1)
            return dets, num, kept, protos

        self._infer = jax.jit(infer)

    def __call__(self, variables, loader: DataLoader, max_batches: Optional[int] = None) -> Dict:
        from ..nn.heads import decode_masks
        from ..ops.boxes import xywh2xyxy
        from ..utils.metrics import TaskMetrics, mask_iou_np

        metrics = TaskMetrics(self.model.nc, self.model.names, task_key="mask")
        n_images = 0
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            dets, num, kept, protos = jax.device_get(
                self._infer(variables, jnp.asarray(batch["img"])))
            imgsz = batch["img"].shape[1]
            for i in range(len(dets)):
                k = int(num[i])
                d = dets[i][:k]
                m = batch["gt_mask"][i].astype(bool)
                gt_boxes = np.asarray(xywh2xyxy(jnp.asarray(batch["gt_boxes"][i][m] * imgsz)))
                gt_cls = batch["gt_cls"][i][m]
                metrics.update(d, gt_boxes, gt_cls)
                gt_masks = batch["gt_masks"][i][m]  # (g, Hm, Wm)
                pm = np.asarray(decode_masks(
                    jnp.asarray(kept[i][:k]), jnp.asarray(protos[i]),
                    jnp.asarray(d[:, :4]), (imgsz, imgsz))) > 0.5
                aff = mask_iou_np(gt_masks.astype(bool), pm)
                metrics.update_task(d, aff, gt_cls)
                n_images += 1
        out = metrics.results()
        out["images"] = n_images
        return out


class PoseValidator:
    """Box + OKS keypoint mAP (reference models/yolo/pose/val.py)."""

    def __init__(self, model: DetectionModel, conf: float = 0.001, iou: float = 0.7,
                 max_det: int = 300, kpt_shape=(17, 3)):
        from ..losses.extra import kpts_decode
        from ..nn.heads import flatten_levels
        from ..ops.anchors import make_anchors

        self.model = model
        self.conf, self.iou, self.max_det = conf, iou, max_det
        self.kpt_shape = kpt_shape

        def infer(variables, img):
            from ..kernels.preprocess import device_normalize

            img = device_normalize(img)  # uint8 val batches /255 on device
            outputs = model.apply(variables, img)
            det_maps, kpt_maps = outputs
            pred = model.decode_outputs(outputs, img_size=img.shape[1])
            dets, num, anchor_idx = non_max_suppression(
                pred, conf_thres=conf, iou_thres=iou, max_det=max_det,
                nc=model.nc, return_idx=True)
            shapes = [f.shape[1:3] for f in det_maps]
            anchors, stride_t = make_anchors(shapes, model.strides)
            nk, nd = kpt_shape
            pk = flatten_levels(kpt_maps).reshape(img.shape[0], -1, nk, nd)
            dec = kpts_decode(anchors, pk)  # grid units
            dec = dec.at[..., :2].multiply(stride_t[None, :, :, None])
            if nd == 3:  # visibility logits → probabilities (match predictor)
                dec = dec.at[..., 2].set(jax.nn.sigmoid(dec[..., 2]))
            kept = jnp.take_along_axis(dec, anchor_idx[..., None, None], axis=1)
            return dets, num, kept

        self._infer = jax.jit(infer)

    def __call__(self, variables, loader: DataLoader, max_batches: Optional[int] = None) -> Dict:
        from ..ops.boxes import xywh2xyxy
        from ..utils.metrics import TaskMetrics, kpt_oks_np

        metrics = TaskMetrics(self.model.nc, self.model.names, task_key="pose")
        n_images = 0
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            dets, num, kept = jax.device_get(self._infer(variables, jnp.asarray(batch["img"])))
            imgsz = batch["img"].shape[1]
            for i in range(len(dets)):
                k = int(num[i])
                d = dets[i][:k]
                m = batch["gt_mask"][i].astype(bool)
                gt_boxes = np.asarray(xywh2xyxy(jnp.asarray(batch["gt_boxes"][i][m] * imgsz)))
                gt_cls = batch["gt_cls"][i][m]
                metrics.update(d, gt_boxes, gt_cls)
                gk = batch["gt_kpts"][i][m].astype(np.float64).copy()  # (g, K, 3), xy in [0,1]
                gk[..., 0] *= imgsz
                gk[..., 1] *= imgsz
                area = np.clip((gt_boxes[:, 2] - gt_boxes[:, 0])
                               * (gt_boxes[:, 3] - gt_boxes[:, 1]), 1e-9, None) * 0.53
                aff = kpt_oks_np(gk, kept[i][:k], area)
                metrics.update_task(d, aff, gt_cls)
                n_images += 1
        out = metrics.results()
        out["images"] = n_images
        return out


class OBBValidator:
    """Rotated-box probiou mAP (reference models/yolo/obb/val.py)."""

    def __init__(self, model: DetectionModel, conf: float = 0.001, iou: float = 0.7,
                 max_det: int = 300):
        from ..ops.nms import non_max_suppression_rotated

        self.model = model
        self.conf, self.iou, self.max_det = conf, iou, max_det

        def infer(variables, img):
            from ..kernels.preprocess import device_normalize

            img = device_normalize(img)  # uint8 val batches /255 on device
            pred = model.predict(variables, img)  # (B, 4+nc+1, A) rotated
            return non_max_suppression_rotated(
                pred, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=model.nc)

        self._infer = jax.jit(infer)

    def __call__(self, variables, loader: DataLoader, max_batches: Optional[int] = None) -> Dict:
        from ..losses.extra import probiou
        from ..utils.metrics import TaskMetrics

        metrics = TaskMetrics(self.model.nc, self.model.names, task_key="rbox")
        n_images = 0
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            dets, num = jax.device_get(self._infer(variables, jnp.asarray(batch["img"])))
            imgsz = batch["img"].shape[1]
            for i in range(len(dets)):
                k = int(num[i])
                d = dets[i][:k]  # [x, y, w, h, angle, conf, cls]
                m = batch["gt_mask"][i].astype(bool)
                gt5 = batch["gt_boxes"][i][m].astype(np.float64).copy()
                gt5[:, :4] *= imgsz
                gt_cls = batch["gt_cls"][i][m]
                # axis-aligned box branch for the standard columns
                d_aligned = np.concatenate([
                    d[:, 0:1] - d[:, 2:3] / 2, d[:, 1:2] - d[:, 3:4] / 2,
                    d[:, 0:1] + d[:, 2:3] / 2, d[:, 1:2] + d[:, 3:4] / 2,
                    d[:, 5:7]], axis=1)
                gt_aligned = np.concatenate([
                    gt5[:, 0:1] - gt5[:, 2:3] / 2, gt5[:, 1:2] - gt5[:, 3:4] / 2,
                    gt5[:, 0:1] + gt5[:, 2:3] / 2, gt5[:, 1:2] + gt5[:, 3:4] / 2], axis=1)
                metrics.update(d_aligned, gt_aligned, gt_cls)
                if k and len(gt5):
                    aff = np.asarray(probiou(jnp.asarray(gt5[:, None, :5]),
                                             jnp.asarray(d[None, :, :5])))
                else:
                    aff = np.zeros((len(gt5), k))
                metrics.update_task(d_aligned, aff, gt_cls)
                n_images += 1
        out = metrics.results()
        out["images"] = n_images
        return out
