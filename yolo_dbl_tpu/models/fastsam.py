"""FastSAM: segment-anything via a single-class YOLOv8-seg pass + prompts.

Reference parity: models/fastsam/{model,predict,utils}.py — FastSAM is the
yolov8-seg architecture with nc=1 ("everything" mode), plus prompt-based
selection over the predicted instance masks (bbox / point / text prompts;
text prompting requires CLIP, which a zero-egress build cannot load, so it
raises). Border-adjacent boxes snap to the image border
(fastsam/utils.py:4 adjust_bboxes_to_image_border) and near-full-frame boxes
become exact full-frame (fastsam/predict.py postprocess).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.heads import decode_masks, flatten_levels
from ..nn.tasks import DetectionModel
from ..ops.nms import non_max_suppression


def adjust_bboxes_to_image_border(boxes: np.ndarray, image_shape, threshold: int = 20):
    """Snap boxes within `threshold` px of the border onto it (utils.py:4)."""
    h, w = image_shape
    out = boxes.copy()
    out[:, 0] = np.where(out[:, 0] < threshold, 0, out[:, 0])
    out[:, 1] = np.where(out[:, 1] < threshold, 0, out[:, 1])
    out[:, 2] = np.where(out[:, 2] > w - threshold, w, out[:, 2])
    out[:, 3] = np.where(out[:, 3] > h - threshold, h, out[:, 3])
    return out


class FastSAM:
    """Everything-segmentation facade (reference fastsam/model.py)."""

    def __init__(self, scale: str = "s"):
        self.model = DetectionModel(f"yolov8{scale}-seg.yaml", nc=1)

    def init(self, rng, imgsz: int = 640):
        return self.model.init(rng, imgsz=imgsz)

    def everything(self, variables, img, conf: float = 0.4, iou: float = 0.9,
                   max_det: int = 100) -> Dict[str, np.ndarray]:
        """Run the seg model and return all instances: boxes (N, 6) xyxy+conf
        +cls and binary masks (N, H, W) at image resolution."""
        h, w = img.shape[1:3]
        det_maps, coeffs, protos = self.model.apply(variables, img)
        pred = self.model.predict(variables, img)  # (B, 4+1, A) via Detect decode
        coeff_flat = flatten_levels(coeffs)  # (B, A, nm)
        dets, counts, anchor_idx = non_max_suppression(
            pred, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=1,
            return_idx=True)
        n = int(counts[0])
        kept_coeffs = np.asarray(coeff_flat[0])[np.asarray(anchor_idx[0, :n])]
        rows = np.concatenate([np.asarray(dets[0, :n]), kept_coeffs], axis=-1)
        boxes = adjust_bboxes_to_image_border(rows[:, :4], (h, w))
        # near-full-frame boxes become exact full frame (predict.py postprocess)
        full_box = np.array([0, 0, w, h], np.float32)
        inter = (np.minimum(boxes[:, 2], w) - np.maximum(boxes[:, 0], 0)).clip(0) * (
            np.minimum(boxes[:, 3], h) - np.maximum(boxes[:, 1], 0)).clip(0)
        area = (boxes[:, 2] - boxes[:, 0]).clip(0) * (boxes[:, 3] - boxes[:, 1]).clip(0)
        iou_full = inter / np.maximum(w * h + area - inter, 1e-9)
        boxes[iou_full > 0.9] = full_box
        masks = np.zeros((n, h, w), np.float32)
        if n:
            m = decode_masks(jnp.asarray(rows[:, 6:]), protos[0],
                             jnp.asarray(boxes), (h, w))  # (n, Hm, Wm)
            m = jax.image.resize(m, (n, h, w), "bilinear")
            masks = np.asarray(m > 0.5, np.float32)
        return {"boxes": np.concatenate([boxes, rows[:, 4:6]], -1), "masks": masks}

    @staticmethod
    def prompt(results: Dict[str, np.ndarray], bboxes=None, points=None,
               labels=None, texts=None) -> Dict[str, np.ndarray]:
        """Select instances by prompt (reference fastsam/predict.py prompt):
        bbox → max mask∩box IoU per prompt box; point → masks covering all
        foreground points and no background points."""
        if texts is not None:
            raise NotImplementedError(
                "text prompts need CLIP embeddings; unavailable in a zero-egress build")
        masks = results["masks"]
        n = len(masks)
        if n == 0 or (bboxes is None and points is None):
            return results
        idx = np.zeros(n, bool)
        if bboxes is not None:
            bb = np.atleast_2d(np.asarray(bboxes, np.int32))
            bbox_areas = (bb[:, 3] - bb[:, 1]) * (bb[:, 2] - bb[:, 0])
            mask_in = np.stack([
                masks[:, b[1]:b[3], b[0]:b[2]].sum(axis=(1, 2)) for b in bb])  # (P, N)
            mask_areas = masks.sum(axis=(1, 2))[None]
            union = bbox_areas[:, None] + mask_areas - mask_in
            idx[np.argmax(mask_in / np.maximum(union, 1e-9), axis=1)] = True
        if points is not None:
            pts = np.atleast_2d(np.asarray(points, np.int32))
            lab = np.ones(len(pts), np.int32) if labels is None else np.asarray(labels)
            for p, l in zip(pts, lab):
                hit = masks[:, p[1], p[0]] > 0
                idx = (idx | hit) if l else (idx & ~hit)
        return {"boxes": results["boxes"][idx], "masks": masks[idx]}
