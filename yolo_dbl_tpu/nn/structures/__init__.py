"""Backbone structures pool (reference nn/structures/, 20 files)."""

from .blocks import (
    APConvPinwheel,
    EffBlock,
    ExtractLayer,
    FasterBlock,
    GhostBottleneckV2,
    GhostBottleneckV3,
    GhostModuleV2,
    GhostModuleV3,
    MBConv,
    PConv,
    RepVGGDW,
    RepViTBlock,
    ScConv,
    UIB,
)
from .swin import PatchEmbed, PatchMerging, SwinStage, SwinTransformerBlock, WindowAttention

__all__ = [
    "APConvPinwheel",
    "EffBlock",
    "ExtractLayer",
    "FasterBlock",
    "GhostBottleneckV2",
    "GhostBottleneckV3",
    "GhostModuleV2",
    "GhostModuleV3",
    "MBConv",
    "PConv",
    "RepVGGDW",
    "RepViTBlock",
    "ScConv",
    "UIB",
    "PatchEmbed",
    "PatchMerging",
    "SwinStage",
    "SwinTransformerBlock",
    "WindowAttention",
]
