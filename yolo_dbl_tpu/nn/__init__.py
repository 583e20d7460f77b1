from . import blocks, common, heads, tasks
from .common import Conv, Conv2d, DSConv, DWConv
from .heads import Detect, decode_detections
from .tasks import DetectionModel, YOLOModel, parse_model_spec, yaml_model_load

__all__ = [
    "blocks",
    "common",
    "heads",
    "tasks",
    "Conv",
    "Conv2d",
    "DSConv",
    "DWConv",
    "Detect",
    "decode_detections",
    "DetectionModel",
    "YOLOModel",
    "parse_model_spec",
    "yaml_model_load",
]
