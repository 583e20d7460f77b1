"""Upsampler module pool (reference nn/modules_upsample/, 67 files).

Behavior-parity batches; each registered in the YAML compiler under its
reference name. DySample lives in nn/blocks.py (it's on the DBL hot path).
"""

from .batch3 import C3k2_EAMC, CARAFEplusplus, DyT, LDA_AQU, M2C2f, MBlock, WindowMHSA
from .eqsr import EQSR
from .fga import FGA, SubPixelMLP
from .sfau import SFAU
from .attn_up import AnyUp, AnyUpPack, JAFAR, RoPE as UpRoPE
from .loftup_dlu import DLUPack, ImplicitFeaturizer, LoftUp
from .pig import C2f_PIG, C2f_WT, InceptionDWConv2d, WTConv2d, wavelet_transform, inverse_wavelet_transform
from .carafe import CARAFE, CARAFE_XiaLiPKU, CARAFE_simplified, CARAFEPack, DLU
from .fade_sapa import FADE, FADELite, SAPA, carafe_apply
from .misc import (
    CAA,
    EFE,
    EUCB,
    FEM,
    FFM_Concat2,
    FFM_Concat3,
    FGM,
    MEUM,
    Multibranch,
    OmniKernel,
    ResBlock_CBAM,
    SCAM,
    SPDConv,
    C3k2_EFE,
)

__all__ = [
    "AnyUp", "AnyUpPack", "JAFAR", "LoftUp", "DLUPack", "ImplicitFeaturizer",
    "FGA", "SFAU", "EQSR", "SubPixelMLP",
    "C2f_PIG",
    "ResBlock_CBAM",
    "C2f_WT",
    "InceptionDWConv2d",
    "WTConv2d",
    "wavelet_transform",
    "inverse_wavelet_transform",
    "C3k2_EAMC",
    "CARAFEplusplus",
    "DyT",
    "LDA_AQU",
    "M2C2f",
    "MBlock",
    "WindowMHSA",
    "FADE",
    "FADELite",
    "SAPA",
    "carafe_apply",
    "CARAFE",
    "CARAFEPack",
    "CARAFE_XiaLiPKU",
    "CARAFE_simplified",
    "DLU",
    "CAA",
    "EFE",
    "EUCB",
    "FEM",
    "FFM_Concat2",
    "FFM_Concat3",
    "FGM",
    "MEUM",
    "Multibranch",
    "OmniKernel",
    "SCAM",
    "SPDConv",
    "C3k2_EFE",
]
