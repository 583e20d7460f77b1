"""Attention module pool (reference nn/modules_attention/, 48 files).

Modules land here in behavior-parity batches; each is registered in the
YAML compiler (nn/tasks.py) under its reference name so the same model
configs resolve.
"""

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
