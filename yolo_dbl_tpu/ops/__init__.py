from .anchors import bbox2dist, dist2bbox, make_anchors
from .boxes import (
    bbox_iou,
    box_area,
    box_iou,
    clip_boxes,
    ltwh2xyxy,
    scale_boxes,
    xywh2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
)
from .nms import non_max_suppression
from .resample import (
    avg_pool2,
    grid_sample_bilinear,
    max_pool,
    nearest_upsample,
    pixel_shuffle,
    pixel_unshuffle,
)

__all__ = [
    "bbox2dist",
    "dist2bbox",
    "make_anchors",
    "bbox_iou",
    "box_area",
    "box_iou",
    "clip_boxes",
    "ltwh2xyxy",
    "scale_boxes",
    "xywh2xyxy",
    "xyxy2ltwh",
    "xyxy2xywh",
    "non_max_suppression",
    "avg_pool2",
    "grid_sample_bilinear",
    "max_pool",
    "nearest_upsample",
    "pixel_shuffle",
    "pixel_unshuffle",
]
