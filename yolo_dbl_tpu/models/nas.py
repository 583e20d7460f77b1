"""YOLO-NAS interface.

Reference parity: models/nas/{model,predict,val}.py. Upstream, YOLO-NAS is a
weights-only family — the reference downloads a super-gradients checkpoint
and adds only pre/post-processing (no architecture YAML exists there either).
In a zero-egress build the download path cannot exist, so this module
provides the same pre/post-processing contract around any backbone that
emits NAS-style raw outputs (decoded xyxy boxes + class scores), plus a
facade that loads such a model from our deploy format.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops.boxes import xyxy2xywh
from ..ops.nms import non_max_suppression


def nas_postprocess(boxes_xyxy, scores, conf: float = 0.25, iou: float = 0.7,
                    max_det: int = 300, class_agnostic: bool = False):
    """NAS raw outputs → final detections (reference nas/predict.py:40):
    the network emits decoded xyxy boxes (B, A, 4) and class scores
    (B, A, nc); convert to the standard (B, 4+nc, A) layout and run NMS.
    """
    xywh = xyxy2xywh(jnp.asarray(boxes_xyxy))
    pred = jnp.concatenate([xywh, jnp.asarray(scores)], axis=-1).swapaxes(-1, -2)
    return non_max_suppression(
        pred, conf_thres=conf, iou_thres=iou, max_det=max_det,
        multi_label=False, class_agnostic=class_agnostic)


class NAS:
    """YOLO-NAS facade (reference nas/model.py:26). Weights-only upstream;
    here it wraps a deploy-format export of a NAS-style model."""

    def __init__(self, model_path: str = "yolo_nas_s"):
        from pathlib import Path

        p = Path(str(model_path))
        if not p.exists():
            raise FileNotFoundError(
                "YOLO-NAS ships as pretrained weights only (no architecture "
                "yaml upstream); a zero-egress build cannot download "
                f"'{model_path}'. Export a NAS-style model to the deploy "
                "format and pass its path instead.")
        from ..engine.exporter import load_stablehlo

        self.fn = load_stablehlo(str(p))

    def predict(self, img, conf: float = 0.25, iou: float = 0.7, max_det: int = 300):
        boxes, scores = self.fn(img)
        return nas_postprocess(boxes, scores, conf=conf, iou=iou, max_det=max_det)
