"""Attention module pool (reference nn/modules_attention/, 48 files).

Modules land here in behavior-parity batches; each is registered in the
YAML compiler (nn/tasks.py) under its reference name so the same model
configs resolve.
"""

from .spatial import (
    BoTAttention,
    EdgeAwareAttention,
    EfficientAttention,
    FullyAttentionalBlock,
    HiLo,
    MHSA,
    NonLocalBlock2D,
)
from .channel import (
    BAM,
    CBAM,
    ChannelAttention,
    CoordAttention,
    CoTNetLayer,
    ECALayer,
    ELA,
    EMA,
    GAM,
    MLCA,
    SELayer,
    SimAM,
    SpatialAttention,
    TripletAttention,
)

__all__ = [
    "BoTAttention",
    "EdgeAwareAttention",
    "EfficientAttention",
    "FullyAttentionalBlock",
    "HiLo",
    "MHSA",
    "NonLocalBlock2D",
    "BAM",
    "CBAM",
    "ChannelAttention",
    "CoordAttention",
    "CoTNetLayer",
    "ECALayer",
    "ELA",
    "EMA",
    "GAM",
    "MLCA",
    "SELayer",
    "SimAM",
    "SpatialAttention",
    "TripletAttention",
]
