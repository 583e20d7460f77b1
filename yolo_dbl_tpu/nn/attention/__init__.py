"""Attention module pool (reference nn/modules_attention/, 48 files).

Modules land here in behavior-parity batches; each is registered in the
YAML compiler (nn/tasks.py) under its reference name so the same model
configs resolve.
"""

from .bigarch import (
    DAT,
    AxialAttention,
    AxialBlock,
    BiFormerNCHW,
    DAttention,
    DeBiAttentionBlock,
    OutlookAttention,
    Outlooker,
    SwinTransformer,
)
from .extra import AIFI, ASFF, ASFFmobile, CPCA, PSAModule
from .sla import SLA, sparse_linear_attention
from .spatial import (
    BoTAttention,
    EdgeAwareAttention,
    EdgeAwareAttentionV2,
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
    "DAT",
    "AxialAttention",
    "AxialBlock",
    "BiFormerNCHW",
    "DAttention",
    "DeBiAttentionBlock",
    "OutlookAttention",
    "Outlooker",
    "SwinTransformer",
    "AIFI",
    "ASFF",
    "ASFFmobile",
    "CPCA",
    "PSAModule",
    "SLA",
    "sparse_linear_attention",
    "BoTAttention",
    "EdgeAwareAttention",
    "EdgeAwareAttentionV2",
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
