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
from .giraffe import BasicBlock3x3Reverse, ConvBNAct, CSPStage, GiraffeNeckV2, RepConvG
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
    "BasicBlock3x3Reverse",
    "ConvBNAct",
    "CSPStage",
    "GiraffeNeckV2",
    "RepConvG",
    "PatchEmbed",
    "PatchMerging",
    "SwinStage",
    "SwinTransformerBlock",
    "WindowAttention",
]
