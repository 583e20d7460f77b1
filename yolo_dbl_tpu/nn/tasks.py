"""YAML → model compiler and task models.

TPU-native re-implementation of the reference's model compiler
(nn/tasks.py:947 `parse_model`, tasks.py:313 `DetectionModel`,
tasks.py:1211-1260 yaml/scale helpers). The same `[from, repeats, module,
args]` YAML rows and channel-inference rules are supported, but instead of
building an nn.Sequential executed layer-by-layer in Python at every step,
we compile the graph once into a flax module whose __call__ is traced and
jit-compiled by XLA — the whole network is a single fused program.

Two artifacts:
  * `parse_model_spec(yaml_dict, ch)` — pure spec pass: resolves scales
    (depth/width/max_channels), channel arithmetic, repeat expansion; returns
    a list of LayerSpec rows plus the save-list for multi-input routing.
  * `YOLOModel` — linen module executing the spec (static Python loop at
    trace time, sequential-with-skip exactly like BaseModel._predict_once,
    reference tasks.py:145-173).
"""

from __future__ import annotations

import ast
import math
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import yaml

from ..ops.resample import max_pool, nearest_upsample
from . import blocks as B
from .common import (Conv, ConvTranspose2d, DSConv, DWConv, default_act,
                     default_act_ctx, resolve_act)
from .heads import Detect, decode_detections

Dtype = Any

CFG_DIR = Path(__file__).resolve().parent.parent / "cfg"


def make_divisible(x, divisor=8):
    """Round channel count up to the nearest multiple (reference utils/__init__.py)."""
    return math.ceil(x / divisor) * divisor


def guess_model_scale(model_path) -> str:
    """Extract the n/s/m/l/x scale char from a model name (reference tasks.py:1227)."""
    m = re.search(r"yolo[v]?\d+([nslmx])", Path(model_path).stem)
    return m.group(1) if m else ""


def yaml_model_load(path) -> Dict:
    """Load a model YAML, resolving scale chars in the name (reference tasks.py:1245).

    'yolov13s_DBL.yaml' → loads cfg/models/v13/yolov13_DBL.yaml with scale='s'.
    """
    path = Path(path)
    stem = path.stem
    scale = guess_model_scale(stem)
    unified = re.sub(r"(\d+)([nslmx])(.+)?$", r"\1\3", stem) + ".yaml"
    candidates = [path]
    if path.parent == Path("."):
        candidates += sorted(CFG_DIR.glob(f"models/*/{stem}.yaml"))
        candidates += sorted(CFG_DIR.glob(f"models/*/{unified}"))
    candidates.append(path.with_name(unified))
    for cand in candidates:
        if cand.is_file():
            with open(cand) as f:
                d = yaml.safe_load(f)
            d["scale"] = scale
            d["yaml_file"] = str(cand)
            return d
    raise FileNotFoundError(f"Model YAML not found for '{path}'")


@dataclass
class LayerSpec:
    """One compiled layer row."""

    i: int  # layer index
    f: Union[int, List[int]]  # input layer index/indices (-1 = previous)
    name: str  # module type name
    args: List[Any]  # resolved positional args (incl. channels)
    c2: int  # output channels
    n: int = 1  # outer repeat count (sequential chain)


@dataclass
class ModelSpec:
    layers: List[LayerSpec]
    save: List[int]
    nc: int
    scale: str
    yaml_dict: Dict = field(default_factory=dict)


# module families, mirroring the reference's parse_model sets (tasks.py:981-1092)
_C2_SCALED = {
    "Conv", "DWConv", "DSConv", "Bottleneck", "DSBottleneck", "C2f", "C3", "C3k",
    "C3k2", "DSC3k2", "DSC3k", "SPPF", "A2C2f", "GhostConv", "Focus",
    # attention/backbone modules the reference registers with (c1, c2) args
    # (tasks.py:1030-1045): CoordAttention, GAM, MHSA_YOLO, EfficientAttention_YOLO
    "CoordAttention", "GAM", "MHSA_YOLO", "EfficientAttention_YOLO",
    "FEM", "C3k2_EFE", "SPDConv", "PSAModule", "CPCA_YOLO", "SwinTransformer", "Outlooker_YOLO", "M2C2f", "C3k2_EAMC", "C2f_PIG", "C2f_WT",
    # (c1, c2) family additions at reference tasks.py:1023,1027
    "ResBlock_CBAM", "DeBiAttention_YOLO",
    # structures family registered with (c1, c2) in the reference (tasks.py:1036-1046)
    "UIB", "RepViTBlock", "GhostModuleV3", "GhostBottleneckV3", "GhostModuleV2",
    "GhostBottleneckV2", "PatchEmbed", "SwinStage", "PatchMerging", "EffBlock",
    "FasterBlock", "MBConv", "APConv",
    # v7/v9/v10/v11 family (reference tasks.py:1001-1016)
    "RepGhostBottleneck", "RepLKBlock", "GGhostBottleneck", "GGhostStage",
    "RepConv", "RepCSP", "RepNCSPELAN4", "ELAN1", "ADown", "AConv", "SPPELAN",
    "SCDown", "C2fCIB", "PSA", "C2PSA", "RepC3", "C2fAttn",
    "C3Ghost", "GhostBottleneck", "C1", "C2", "SPP", "C3_Faster",
}
_REPEAT_INSERT = {"C2f", "C3", "C3k2", "DSC3k2", "DSC3k", "A2C2f", "C3k2_EFE", "EffBlock", "M2C2f", "C3k2_EAMC",
                  "C2fCIB", "C2PSA", "RepCSP", "RepC3", "C2fAttn", "C3Ghost", "C1", "C2", "C3_Faster"}
_LEGACY_FALSE = {"C3k2", "DSC3k2", "A2C2f"}
# c1-only modules: yaml arg[0] (if any) is ignored, c2 = c1 (tasks.py:1156-1186)
_C1_ONLY = {
    "DySample", "LSKblock", "CBAM", "SLA", "EMA", "SELayer", "EdgeAwareAttention",
    "EdgeAwareAttentionV2", "BAM", "BAM_YOLO", "FullyAttentionalBlock", "HiLo",
    "NonLocalBlock2D",
    "BiFormerNCHW", "DAT_YOLO", "SCAM", "ELA", "CAA", "BoTAttention",
    "BoTAttention_YOLO",
    "CoTNetLayer", "TripletAttention", "EUCB", "MEUM", "DLU", "CARAFE", "CARAFEplusplus", "LDA_AQU",
    # extensions beyond the reference registry (reachable only from test.py
    # there; YAML-reachable here): c1-only by construction
    "ECALayer", "SimAM", "MLCA", "ScConv", "PConv", "CPCA", "MQA",
    # round-3 tail (VERDICT r2 #6): c1-only by construction
    "AxialBlock_dynamic", "AxialBlock_wopos", "ECALayer_ns",
    "ShiftWindowAttention", "FusedKQnA", "CARAFEPack",
}


def parse_model_spec(d: Dict, ch: int = 3, verbose: bool = False) -> ModelSpec:
    """Resolve a model YAML dict into a ModelSpec (reference tasks.py:947)."""
    nc = d.get("nc", 80)
    scales = d.get("scales")
    depth, width, max_channels = d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0), float("inf")
    scale = d.get("scale", "")
    if scales:
        if not scale:
            scale = tuple(scales.keys())[0]
        depth, width, max_channels = scales[scale]

    chs = [ch]
    layers: List[LayerSpec] = []
    save: List[int] = []
    legacy = True
    for i, (f, n, m, args) in enumerate(d["backbone"] + d["head"]):
        args = list(args)
        for j, a in enumerate(args):
            if isinstance(a, str) and a == "nc":
                args[j] = nc
            elif isinstance(a, str) and a in d:
                # named yaml keys (anchors, kpt_shape, …) resolve to their value
                args[j] = d[a]
            elif isinstance(a, str):
                # yaml `None`/`True` arrive as strings (reference tasks.py:979
                # literal_evals them); leave real strings like "nearest" alone
                try:
                    args[j] = ast.literal_eval(a)
                except (ValueError, SyntaxError):
                    pass
        # an `anchors` arg without a top-level anchors key (FFCA-YOLO-L.yaml)
        # is a stale placeholder for the anchor-free Detect — drop it
        args = [a for a in args if not (isinstance(a, str) and a == "anchors")]
        n_ = n
        n = max(round(n * depth), 1) if n > 1 else n

        if m in _C2_SCALED:
            c1, c2 = chs[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            if m == "C2fAttn":  # embed channels / heads (reference tasks.py:1050)
                args[1] = make_divisible(min(args[1], max_channels // 2) * width, 8)
                args[2] = int(max(round(min(args[2], max_channels // 2 // 32)) * width, 1)
                              if args[2] > 1 else args[2])
            args = [c1, c2, *args[1:]]
            if m in _REPEAT_INSERT:
                args.insert(2, n)
                n = 1
            if m in _LEGACY_FALSE:
                legacy = False
            if m == "A2C2f" and scale in "lx" and scale:
                args.append(True)   # residual
                args.append(1.5)    # mlp_ratio
        elif m in ("HyperACE", "HyperACE2"):
            legacy = False
            c1 = chs[f[1]]
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            he = args[1]
            if scale == "n":
                he = int(args[1] * 0.5)
            elif scale == "x":
                he = int(args[1] * 1.5)
            args = [c1, c2, n, he, *args[2:]]
            n = 1
        elif m == "DownsampleConv":
            c1 = chs[f]
            c2 = c1 * 2
            args = [c1]  # reference drops the yaml channel_adjust arg (tasks.py:1137)
        elif m == "FullPAD_Tunnel":
            c2 = chs[f[0]]
            args = []
        elif m == "GiraffeNeckV2":
            c1 = [chs[x] for x in f]
            c2 = args[0]
            args = [c1, *args]
        elif m == "ExtractLayer":
            c2 = chs[f][args[0]] if isinstance(chs[f], (list, tuple)) else chs[f]
        elif m == "Index":
            # reference conv.py:362 Index(c1, c2, index): select one tensor
            # from a list output; c2 = args[0] unscaled (tasks.py:1115)
            c2 = args[0]
            args = [chs[f], c2, *args[1:]]
        elif m == "Multibranch":
            c2 = chs[f]
            args = [c2]
        elif m in _C1_ONLY:
            c1 = c2 = chs[f]
            args = [c1, *args[1:]]
        elif m == "FFM_Concat2":
            # (reference tasks.py:1150): [dim, c//2, c//2]
            c2 = sum(chs[x] for x in f)
            args = [args[0], c2 // 2, c2 // 2]
        elif m == "FFM_Concat3":
            # (reference tasks.py:1153): [dim, c//4, c//2, c//4]
            c2 = sum(chs[x] for x in f)
            args = [args[0], c2 // 4, c2 // 2, c2 // 4]
        elif m == "Concat":
            c2 = sum(chs[x] for x in f)
        elif m == "v10Detect":
            args.append([chs[x] for x in f])
            c2 = 0
        elif m in ("Detect", "Segment", "Pose", "OBB"):
            if m == "Segment" and len(args) > 2:
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            args.append([chs[x] for x in f])
            args.append(legacy)
            c2 = 0  # heads have no single channel count
        elif m == "Classify":
            c1, c2 = chs[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
        elif m == "AIFI":
            # channels prepended, cm/heads raw (reference tasks.py:1093)
            args = [chs[f], *args]
            c2 = chs[f]
        elif m in ("HGStem", "HGBlock"):
            # PPHGNetV2 family: cm, c2 raw, no width scaling (tasks.py:1095)
            c1, cm, c2 = chs[f], args[0], args[1]
            args = [c1, cm, c2, *args[2:]]
            if m == "HGBlock":
                args.insert(4, n)
                n = 1
        elif m == "ResNetLayer":
            c2 = args[1] if args[3] else args[1] * 4  # (tasks.py:1101)
        elif m == "ImagePoolingAttn":
            args.append([chs[x] for x in f])  # [ec, ch] (reference tasks.py:1107)
            c2 = chs[f[0]]  # layer output is the text guide; keep a placeholder
        elif m == "WorldDetect":
            args.append([chs[x] for x in f])
            c2 = 0
        elif m == "RTDETRDecoder":
            args.insert(1, [chs[x] for x in f])  # (tasks.py:1113)
            c2 = 0
        elif m in ("MP", "SP"):
            c2 = chs[f]  # parameter-free maxpool (yolov7)
        elif m in ("nn.MaxPool2d", "nn.ZeroPad2d", "nn.Identity", "Silence"):
            c2 = chs[f]  # parameter-free torch layers (v3-tiny, v9e)
        elif m in ("CBLinear", "TorchVision"):
            # c2 is args[0] unscaled: CBLinear's branch-width list /
            # TorchVision's trunk output channels (reference tasks.py:1115)
            c1, c2 = chs[f], args[0]
            args = [c1, c2, *args[1:]]
        elif m == "CBFuse":
            c2 = chs[f[-1]]  # (reference tasks.py:1119)
        elif m == "SPPCSPC":
            c1, c2 = chs[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
        elif m == "IDetect":
            args.append([chs[x] for x in f])
            c2 = 0
        elif m in ("nn.ConvTranspose2d", "ConvTranspose2d"):
            # raw torch transposed conv, c2-scaled (reference tasks.py:1007)
            m = "ConvTranspose2d"
            c1, c2 = chs[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
        elif m == "nn.Upsample" or m == "Upsample":
            m = "Upsample"
            c2 = chs[f]
        elif m == "nn.BatchNorm2d":
            c2 = chs[f]
            args = [c2]
        else:
            c2 = chs[f] if isinstance(f, int) else chs[f[-1]]

        layers.append(LayerSpec(i=i, f=f, name=m, args=args, c2=c2, n=n))
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            chs = []
        chs.append(c2)
    return ModelSpec(layers=layers, save=sorted(set(save)), nc=nc, scale=scale, yaml_dict=d)


def _attention_builders():
    from . import attention as A

    return {
        "SELayer": lambda a, d, n: A.SELayer(a[0], *a[1:], dtype=d, name=n),
        "ECALayer": lambda a, d, n: A.ECALayer(a[0], *a[1:], dtype=d, name=n),
        "CBAM": lambda a, d, n: A.CBAM(a[0], *a[1:], dtype=d, name=n),
        "SimAM": lambda a, d, n: A.SimAM(a[0], *a[1:], dtype=d, name=n),
        "EMA": lambda a, d, n: A.EMA(a[0], *a[1:], dtype=d, name=n),
        "CoordAttention": lambda a, d, n: A.CoordAttention(a[0], *a[1:], dtype=d, name=n),
        "GAM": lambda a, d, n: A.GAM(a[0], *a[1:], dtype=d, name=n),
        "TripletAttention": lambda a, d, n: A.TripletAttention(a[0], *a[1:], dtype=d, name=n),
        "MLCA": lambda a, d, n: A.MLCA(a[0], *a[1:], dtype=d, name=n),
        "ELA": lambda a, d, n: A.ELA(a[0], *a[1:], dtype=d, name=n),
        "BAM": lambda a, d, n: A.BAM(a[0], *a[1:], dtype=d, name=n),
        # reference YAML spelling (modules_attention/BAM.py:51 BAM_YOLO(c1, reduction))
        "BAM_YOLO": lambda a, d, n: A.BAM(a[0], *a[1:], dtype=d, name=n),
        "CoTNetLayer": lambda a, d, n: A.CoTNetLayer(a[0], *a[1:], dtype=d, name=n),
        "EfficientAttention": lambda a, d, n: A.EfficientAttention(a[0], *a[1:], dtype=d, name=n),
        "HiLo": lambda a, d, n: A.HiLo(a[0], *a[1:], dtype=d, name=n),
        "FullyAttentionalBlock": lambda a, d, n: A.FullyAttentionalBlock(a[0], *a[1:], dtype=d, name=n),
        "NonLocalBlock2D": lambda a, d, n: A.NonLocalBlock2D(a[0], *a[1:], dtype=d, name=n),
        "MHSA": lambda a, d, n: A.MHSA(a[0], *a[1:], dtype=d, name=n),
        "MHSA_YOLO": lambda a, d, n: A.MHSA(a[0], *a[1:], dtype=d, name=n),
        "BoTAttention": lambda a, d, n: A.BoTAttention(a[0], *a[1:], dtype=d, name=n),
        # reference YAML spelling (BoTNetAttention.py:245 BoTAttention_YOLO(dim, ...))
        "BoTAttention_YOLO": lambda a, d, n: A.BoTAttention(a[0], *a[1:], dtype=d, name=n),
        "EdgeAwareAttention": lambda a, d, n: A.EdgeAwareAttention(a[0], *a[1:], dtype=d, name=n),
        "EdgeAwareAttentionV2": lambda a, d, n: A.EdgeAwareAttentionV2(a[0], *a[1:], dtype=d, name=n),
        # reference wrapper: EfficientAttention_YOLO(c1, c2, head_count=8, key_channels=64)
        "SLA": lambda a, d, n: A.SLA(a[0], *a[1:], dtype=d, name=n),
        "BiFormerNCHW": lambda a, d, n: A.BiFormerNCHW(a[0], *a[1:], dtype=d, name=n),
        "DAT_YOLO": lambda a, d, n: A.DAT(a[0], *a[1:], dtype=d, name=n),
        "DeBiAttentionBlock": lambda a, d, n: A.DeBiAttentionBlock(a[0], *a[1:], dtype=d, name=n),
        "AxialBlock_YOLO": lambda a, d, n: A.AxialBlock(a[0] // 2, kernel_size=a[1] if len(a) > 1 else 20, dtype=d, name=n),
        "AxialBlock_dynamic": lambda a, d, n: A.AxialBlock_dynamic(
            a[0] // 2, kernel_size=a[1] if len(a) > 1 else 20, dtype=d, name=n),
        "AxialBlock_wopos": lambda a, d, n: A.AxialBlock_wopos(
            a[0] // 2, kernel_size=a[1] if len(a) > 1 else 20, dtype=d, name=n),
        "DeBiAttention_YOLO": lambda a, d, n: A.DeBiAttention_YOLO(a[0], a[1], *a[2:], dtype=d, name=n),
        "ECALayer_ns": lambda a, d, n: A.ECALayer_ns(a[0], a[1] if len(a) > 1 else 3, dtype=d, name=n),
        "ShiftWindowAttention": lambda a, d, n: A.ShiftWindowAttention(a[0], *a[1:], dtype=d, name=n),
        "FusedKQnA": lambda a, d, n: A.FusedKQnA(
            n_q=a[1] if len(a) > 1 else 1, n_channels=a[0],
            n_heads=a[2] if len(a) > 2 else 8, ksize=a[3] if len(a) > 3 else 3,
            dtype=d, name=n),
        "Outlooker_YOLO": lambda a, d, n: A.Outlooker(a[1], *a[2:], dtype=d, name=n),
        "SwinTransformer": lambda a, d, n: A.SwinTransformer(a[0], a[1], *a[2:], dtype=d, name=n),
        "AIFI": lambda a, d, n: A.AIFI(
            a[0], cm=(a[1] if len(a) > 1 else 2048),
            num_heads=(a[2] if len(a) > 2 else 8), dtype=d, name=n),
        "PSAModule": lambda a, d, n: A.PSAModule(a[1], *a[2:], dtype=d, name=n),
        "CPCA": lambda a, d, n: A.CPCA(a[0], *a[1:], dtype=d, name=n),
        "CPCA_YOLO": lambda a, d, n: A.CPCA(a[0], a[1], *a[2:], dtype=d, name=n),
        "ASFF": lambda a, d, n: A.ASFF(a[0] if isinstance(a[0], int) else 0, *a[1:], dtype=d, name=n),
        "EfficientAttention_YOLO": lambda a, d, n: A.EfficientAttention(
            a[0],
            key_channels=max(a[3] if len(a) > 3 else 64, (a[2] if len(a) > 2 else 8)),
            head_count=a[2] if len(a) > 2 else 8,
            value_channels=a[0],
            dtype=d, name=n,
        ),
    }


_ATTENTION_BUILDERS = _attention_builders()


def _upsample_builders():
    from . import upsample as U

    return {
        "CARAFE": lambda a, d, n: U.CARAFE(a[0], *a[1:], dtype=d, name=n),
        "CARAFE_XiaLiPKU": lambda a, d, n: U.CARAFE_XiaLiPKU(a[0], *a[1:], dtype=d, name=n),
        "CARAFE_simplified": lambda a, d, n: U.CARAFE_simplified(a[0], *a[1:], dtype=d, name=n),
        "DLU": lambda a, d, n: U.DLU(a[0], *a[1:], dtype=d, name=n),
        "EUCB": lambda a, d, n: U.EUCB(a[0], *a[1:], dtype=d, name=n),
        "MEUM": lambda a, d, n: U.MEUM(a[0], *a[1:], dtype=d, name=n),
        "SCAM": lambda a, d, n: U.SCAM(a[0], *a[1:], dtype=d, name=n),
        "CAA": lambda a, d, n: U.CAA(a[0], *a[1:], dtype=d, name=n),
        "SPDConv": lambda a, d, n: U.SPDConv(a[0], a[1], dtype=d, name=n),
        "FEM": lambda a, d, n: U.FEM(a[0], a[1], *a[2:], dtype=d, name=n),
        "C3k2_EFE": lambda a, d, n: U.C3k2_EFE(a[1], *a[2:], dtype=d, name=n),
        "Multibranch": lambda a, d, n: U.Multibranch(a[0], *a[1:], dtype=d, name=n),
        "FFM_Concat2": lambda a, d, n: U.FFM_Concat2(a[0], a[1], a[2], dtype=d, name=n),
        "M2C2f": lambda a, d, n: U.M2C2f(a[1], *a[2:], dtype=d, name=n),
        "C2f_PIG": lambda a, d, n: U.C2f_PIG(a[1], *a[2:], dtype=d, name=n),
        "C2f_WT": lambda a, d, n: U.C2f_WT(a[1], *a[2:], dtype=d, name=n),
        "C3k2_EAMC": lambda a, d, n: U.C3k2_EAMC(a[1], *a[2:], dtype=d, name=n),
        "CARAFEplusplus": lambda a, d, n: U.CARAFEplusplus(a[0], *a[1:], dtype=d, name=n),
        "CARAFEPack": lambda a, d, n: U.CARAFEPack(a[0], *a[1:], dtype=d, name=n),
        "ResBlock_CBAM": lambda a, d, n: U.ResBlock_CBAM(a[0], a[1], *a[2:], dtype=d, name=n),
        "LDA_AQU": lambda a, d, n: U.LDA_AQU(a[0], *a[1:], dtype=d, name=n),
        "FFM_Concat3": lambda a, d, n: U.FFM_Concat3(a[0], a[1], a[2], a[3], dtype=d, name=n),
    }


_UPSAMPLE_BUILDERS = _upsample_builders()


def _structure_builders():
    from . import structures as S

    return {
        "PConv": lambda a, d, n: S.PConv(a[0], dtype=d, name=n),
        "FasterBlock": lambda a, d, n: S.FasterBlock(a[1], *a[2:], dtype=d, name=n),
        "ScConv": lambda a, d, n: S.ScConv(a[0], *a[1:], dtype=d, name=n),
        "EffBlock": lambda a, d, n: S.EffBlock(a[1], *a[2:], dtype=d, name=n),
        "MBConv": lambda a, d, n: S.MBConv(a[1], *a[2:], dtype=d, name=n),
        # reference signature RepViTBlock(inp, hidden_dim, oup, k, s, se, hs)
        "RepViTBlock": lambda a, d, n: S.RepViTBlock(
            a[1], a[2] if len(a) > 2 else a[1], *a[3:], dtype=d, name=n
        ),
        "UIB": lambda a, d, n: S.UIB(a[1], *a[2:], dtype=d, name=n),
        "GhostModuleV2": lambda a, d, n: S.GhostModuleV2(a[1], *a[2:], dtype=d, name=n),
        "GhostBottleneckV2": lambda a, d, n: S.GhostBottleneckV2(a[1], a[2] if len(a) > 2 else a[1], *a[3:], dtype=d, name=n),
        "GhostModuleV3": lambda a, d, n: S.GhostModuleV3(a[1], *a[2:], dtype=d, name=n),
        # reference order (in, out, mid)
        "GhostBottleneckV3": lambda a, d, n: S.GhostBottleneckV3(a[1], a[2] if len(a) > 2 else a[1], *a[3:], dtype=d, name=n),
        "PatchEmbed": lambda a, d, n: S.PatchEmbed(a[1], *a[2:], dtype=d, name=n),
        "PatchMerging": lambda a, d, n: S.PatchMerging(a[0], a[1], dtype=d, name=n),
        "SwinStage": lambda a, d, n: S.SwinStage(a[0], a[1], *a[2:], dtype=d, name=n),
        "ExtractLayer": lambda a, d, n: S.ExtractLayer(a[0], name=n),
        # reference Index(c1, c2, index=0) == ExtractLayer on the index arg
        "Index": lambda a, d, n: S.ExtractLayer(a[2] if len(a) > 2 else 0, name=n),
        "MQA": lambda a, d, n: S.MQA(a[0], *a[1:], dtype=d, name=n),
        "MFA": lambda a, d, n: S.MFA(a[1] if len(a) > 1 else a[0], *a[2:], dtype=d, name=n),
        "RepGhostBottleneck": lambda a, d, n: S.RepGhostBottleneck(a[1], a[2] if len(a) > 2 else a[1], *a[3:], dtype=d, name=n),
        "RepLKBlock": lambda a, d, n: S.RepLKBlock(a[1], *a[2:], dtype=d, name=n),
        "GGhostBottleneck": lambda a, d, n: S.GGhostBottleneck(a[1], *a[2:], dtype=d, name=n),
        "GGhostStage": lambda a, d, n: S.GGhostStage(a[1], *a[2:], dtype=d, name=n),
        "GiraffeNeckV2": lambda a, d, n: S.GiraffeNeckV2(
            tuple(a[0]), tuple(a[1]) if len(a) > 1 and isinstance(a[1], (list, tuple)) else tuple(a[0]),
            *a[2:], dtype=d, name=n,
        ),
        "APConv": lambda a, d, n: S.APConvPinwheel(a[1], *a[2:], dtype=d, name=n),
        # args after spec parse: (c1, c2, model, weights, unwrap, truncate)
        "TorchVision": lambda a, d, n: S.TorchVision(a[1], *a[2:], dtype=d, name=n),
    }


_STRUCTURE_BUILDERS = _structure_builders()


def _v9v10_builders():
    from . import v9v10 as V

    return {
        "RepConv": lambda a, d, n: V.RepConv(a[1], *a[2:], dtype=d, name=n),
        "RepCSP": lambda a, d, n: V.RepCSP(a[1], *a[2:], dtype=d, name=n),
        "RepNCSPELAN4": lambda a, d, n: V.RepNCSPELAN4(a[1], a[2], a[3], *a[4:], dtype=d, name=n),
        "ELAN1": lambda a, d, n: V.ELAN1(a[1], a[2], a[3], dtype=d, name=n),
        "ADown": lambda a, d, n: V.ADown(a[1], dtype=d, name=n),
        "AConv": lambda a, d, n: V.AConv(a[1], dtype=d, name=n),
        "SPPELAN": lambda a, d, n: V.SPPELAN(a[1], a[2], *a[3:], dtype=d, name=n),
        "SCDown": lambda a, d, n: V.SCDown(a[1], *a[2:], dtype=d, name=n),
        "C2fCIB": lambda a, d, n: V.C2fCIB(a[1], *a[2:], dtype=d, name=n),
        "PSA": lambda a, d, n: V.PSA(a[1], *a[2:], dtype=d, name=n),
        "C2PSA": lambda a, d, n: V.C2PSA(a[1], *a[2:], dtype=d, name=n),
    }


_V9V10_BUILDERS = _v9v10_builders()


def _build_module(spec: LayerSpec, dtype) -> Optional[Any]:
    """Instantiate the flax module(s) for one LayerSpec row."""
    m, a = spec.name, spec.args

    def mk(idx=None):
        name = f"m{spec.i}" if idx is None else f"m{spec.i}_{idx}"
        if m == "Conv":
            return Conv(*a[1:], dtype=dtype, name=name)
        if m == "DWConv":
            return DWConv(*a[1:], dtype=dtype, name=name)
        if m == "ConvTranspose2d":
            return ConvTranspose2d(*a[1:], dtype=dtype, name=name)
        if m == "DSConv":
            return DSConv(*a[1:], dtype=dtype, name=name)
        if m == "Bottleneck":
            kw = dict(zip(["shortcut", "g", "k", "e"], a[2:]))
            if "k" in kw:
                kw["k"] = tuple(kw["k"])
            return B.Bottleneck(a[1], **kw, dtype=dtype, name=name)
        if m == "C2f":
            return B.C2f(a[1], *a[2:], dtype=dtype, name=name)
        if m == "C3":
            return B.C3(a[1], *a[2:], dtype=dtype, name=name)
        if m == "C3Ghost":
            return B.C3Ghost(a[1], *a[2:], dtype=dtype, name=name)
        if m == "GhostConv":
            return B.GhostConv(a[1], *a[2:], dtype=dtype, name=name)
        if m == "GhostBottleneck":
            return B.GhostBottleneck(a[1], *a[2:], dtype=dtype, name=name)
        if m == "C1":
            return B.C1(a[1], *a[2:], dtype=dtype, name=name)
        if m == "C2":
            return B.C2(a[1], *a[2:], dtype=dtype, name=name)
        if m == "C3k":
            return B.C3k(a[1], *a[2:], dtype=dtype, name=name)
        if m == "C3k2":
            return B.C3k2(a[1], *a[2:], dtype=dtype, name=name)
        if m == "DSC3k2":
            return B.DSC3k2(a[1], *a[2:], dtype=dtype, name=name)
        if m == "DSC3k":
            return B.DSC3k(a[1], *a[2:], dtype=dtype, name=name)
        if m == "DSBottleneck":
            return B.DSBottleneck(a[1], *a[2:], dtype=dtype, name=name)
        if m == "SPPF":
            return B.SPPF(a[1], *a[2:], dtype=dtype, name=name)
        if m == "SPP":
            return B.SPP(a[1], tuple(a[2]) if len(a) > 2 else (5, 9, 13), dtype=dtype, name=name)
        if m == "C3_Faster":
            return B.C3_Faster(a[1], *a[2:], dtype=dtype, name=name)
        if m == "CBLinear":
            return B.CBLinear(tuple(a[1]), *a[2:], dtype=dtype, name=name)
        if m == "SPPCSPC":
            return B.SPPCSPC(a[1], *a[2:], dtype=dtype, name=name)
        if m == "HGStem":
            return B.HGStem(a[1], a[2], dtype=dtype, name=name)
        if m == "HGBlock":
            return B.HGBlock(a[1], *a[2:], dtype=dtype, name=name)
        if m == "RepC3":
            return B.RepC3(a[1], *a[2:], dtype=dtype, name=name)
        if m == "ResNetLayer":
            return B.ResNetLayer(a[1], *a[2:], dtype=dtype, name=name)
        if m == "C2fAttn":
            from . import world as W
            return W.C2fAttn(a[1], *a[2:], dtype=dtype, name=name)
        if m == "ImagePoolingAttn":
            from . import world as W
            return W.ImagePoolingAttn(ec=a[0], ch=tuple(a[1]), dtype=dtype, name=name)
        if m == "WorldDetect":
            from . import world as W
            return W.WorldDetect(nc=a[0], embed=a[1], with_bn=a[2], ch=tuple(a[3]),
                                 dtype=dtype, name=name)
        if m == "RTDETRDecoder":
            from ..models.rtdetr import RTDETRDecoder as _RTD
            return _RTD(nc=a[0], ch=tuple(a[1]), dtype=dtype, name=name)
        if m == "IDetect":
            from .heads import IDetect as _IDetect
            return _IDetect(nc=a[0], anchors=tuple(tuple(x) for x in a[1]),
                            ch=tuple(a[2]), dtype=dtype, name=name)
        if m == "A2C2f":
            return B.A2C2f(a[1], *a[2:], dtype=dtype, name=name)
        if m in ("HyperACE", "HyperACE2"):
            cls = B.HyperACE if m == "HyperACE" else B.HyperACE2
            return cls(*a, dtype=dtype, name=name)
        if m == "DownsampleConv":
            return B.DownsampleConv(channel_adjust=True, dtype=dtype, name=name)
        if m == "FullPAD_Tunnel":
            return B.FullPAD_Tunnel(dtype=dtype, name=name)
        if m == "DySample":
            return B.DySample(a[0], *a[1:], dtype=dtype, name=name)
        if m == "LSKblock":
            return B.LSKblock(a[0], dtype=dtype, name=name)
        if m in _ATTENTION_BUILDERS:
            return _ATTENTION_BUILDERS[m](a, dtype, name)
        if m in _UPSAMPLE_BUILDERS:
            return _UPSAMPLE_BUILDERS[m](a, dtype, name)
        if m in _STRUCTURE_BUILDERS:
            return _STRUCTURE_BUILDERS[m](a, dtype, name)
        if m in _V9V10_BUILDERS:
            return _V9V10_BUILDERS[m](a, dtype, name)
        if m == "Detect":
            nc, ch, legacy = a
            return Detect(nc=nc, ch=tuple(ch), legacy=legacy, dtype=dtype, name=name)
        if m == "v10Detect":
            from .heads import V10Detect
            return V10Detect(nc=a[0], ch=tuple(a[-1]), dtype=dtype, name=name)
        if m == "Segment":
            from .heads import Segment
            nc, nm, npr, ch, legacy = a[0], a[1] if len(a) > 3 else 32, a[2] if len(a) > 4 else 256, a[-2], a[-1]
            return Segment(nc=nc, nm=nm, npr=npr, ch=tuple(ch), legacy=legacy, dtype=dtype, name=name)
        if m == "Pose":
            from .heads import Pose
            nc, ch, legacy = a[0], a[-2], a[-1]
            kpt = tuple(a[1]) if len(a) > 3 else (17, 3)
            return Pose(nc=nc, kpt_shape=kpt, ch=tuple(ch), legacy=legacy, dtype=dtype, name=name)
        if m == "OBB":
            from .heads import OBB
            nc, ch, legacy = a[0], a[-2], a[-1]
            ne = a[1] if len(a) > 3 else 1
            return OBB(nc=nc, ne=ne, ch=tuple(ch), legacy=legacy, dtype=dtype, name=name)
        if m == "Classify":
            from .heads import Classify
            return Classify(a[1], dtype=dtype, name=name)
        if m in ("Upsample", "Concat", "MP", "SP", "CBFuse",
                 "nn.MaxPool2d", "nn.ZeroPad2d", "nn.Identity", "Silence"):
            return None  # parameter-free, handled inline
        raise NotImplementedError(f"module '{m}' not registered in the TPU build yet")

    if spec.n > 1:
        return [mk(j) for j in range(spec.n)]
    return mk()


class YOLOModel(nn.Module):
    """Executes a ModelSpec as a single traced graph (reference tasks.py:145 _predict_once).

    Call returns the list of Detect raw maps (training path) — decode /
    NMS are separate pure functions so train/val/predict share this trunk.
    """

    spec: ModelSpec
    dtype: Dtype = jnp.float32

    def setup(self):
        mods = {}
        for layer in self.spec.layers:
            built = _build_module(layer, self.dtype)
            if built is not None:
                mods[f"layer{layer.i}"] = built
        self._mods = mods

    def __call__(self, x, train: bool = False, text=None):
        # yaml `activation:` overrides the Conv default for this whole trace
        # (reference tasks.py:965 Conv.default_act = eval(act))
        act = self.spec.yaml_dict.get("activation")
        with default_act_ctx(resolve_act(act) if act else None):
            return self._forward(x, train, text)

    def _stem_fusable(self, x, train) -> bool:
        """True when layers 0-1 are the Conv(k3,s1)+Conv(k3,s2) opener that
        the space-to-depth rewrite (ops/fused_stem.py) replaces verbatim."""
        import os

        # Inference: opt-in only — the rewrite wins in isolation (14 -> 4 ms
        # for the pair, tools/exp_slope.py) but measured ~6% SLOWER e2e at
        # b64 (625 vs 663 img/s): XLA's whole-graph scheduling already
        # overlaps the stem's HBM traffic with downstream compute, and the
        # s2d one-hot conv adds un-overlapped work.
        # Training: default ON on TPU, opt-out YOLO_DBL_FUSED_STEM_TRAIN=0 —
        # the pair's BACKWARD is where the C=3/16 layout hurts most (25.6 ->
        # 14.6 ms in isolation, tools/exp_stem_grad.py; e2e scan step 122.1
        # -> 102.9 ms/step = 131 -> 155 img/s at b16@640 on the real chip,
        # tools/exp_train_scan.py 2026-08-17); the train path keeps exact BN
        # semantics via Conv.norm_act phase grouping (tests/test_fused_stem).
        # Off-TPU default OFF: the s2d scatter kernels lose on CPU for the
        # same reason the one-hot sampler does (no MXU to feed).
        if self.is_initializing():
            return False
        if train:
            flag = os.environ.get("YOLO_DBL_FUSED_STEM_TRAIN")
            if flag is not None:
                if flag in ("", "0", "false"):
                    return False
            else:
                from ..utils.device import committed_platform

                if committed_platform() not in ("tpu", "axon"):
                    return False
        elif not os.environ.get("YOLO_DBL_FUSED_STEM"):
            return False
        ls = self.spec.layers
        if len(ls) < 2 or x.ndim != 4 or x.shape[1] % 2 or x.shape[2] % 2:
            return False
        l0, l1 = ls[0], ls[1]
        ok0 = (l0.name == "Conv" and l0.f == -1 and l0.n == 1
               and list(l0.args[2:4]) == [3, 1] and len(l0.args) <= 4)
        ok1 = (l1.name == "Conv" and l1.f == -1 and l1.n == 1
               and list(l1.args[2:4]) == [3, 2] and len(l1.args) <= 4)
        return ok0 and ok1 and 0 not in self.spec.save

    def _forward(self, x, train: bool = False, text=None):
        y: List[Optional[jnp.ndarray]] = []
        out = x
        txt = text  # running guide, updated by ImagePoolingAttn (tasks.py:673)
        if txt is None and any(
            l.name in ("C2fAttn", "ImagePoolingAttn", "WorldDetect") for l in self.spec.layers
        ):
            # default text buffer, like the reference's randn txt_feats init
            txt = text = jnp.zeros((x.shape[0], self.spec.nc, 512), x.dtype)
        skip_layers = ()
        if self._stem_fusable(x, train):
            from ..ops.fused_stem import fused_stem, fused_stem_convs

            m0, m1 = self._mods["layer0"], self._mods["layer1"]
            v0, v1 = m0.variables, m1.variables
            if train:
                # real BN (batch stats + running-average updates) through the
                # layers' norm_act; phase_groups folds the 4 s2d phases
                out = fused_stem_convs(
                    x.astype(self.dtype),
                    v0["params"]["conv"]["kernel"],
                    v1["params"]["conv"]["kernel"],
                    lambda y: m0.norm_act(y, train=True, phase_groups=4),
                    lambda y: m1.norm_act(y, train=True),
                )
            else:
                def bn_tuple(v):
                    return (v["params"]["bn"]["scale"], v["params"]["bn"]["bias"],
                            v["batch_stats"]["bn"]["mean"], v["batch_stats"]["bn"]["var"])

                out = fused_stem(
                    x.astype(self.dtype),
                    v0["params"]["conv"]["kernel"], bn_tuple(v0),
                    v1["params"]["conv"]["kernel"], bn_tuple(v1),
                    default_act(),
                )
            y.append(None)  # layer 0 output never materialized
            y.append(out if 1 in self.spec.save else None)
            skip_layers = (0, 1)
        for layer in self.spec.layers:
            if layer.i in skip_layers:
                continue
            f = layer.f
            if isinstance(f, int):
                inp = out if f == -1 else y[f]
            else:
                inp = [out if j == -1 else y[j] for j in f]
            m = self._mods.get(f"layer{layer.i}")
            if layer.name == "Upsample":
                out = nearest_upsample(inp, int(layer.args[1]) if len(layer.args) > 1 else 2)
            elif layer.name == "Concat":
                out = jnp.concatenate(inp, axis=-1)
            elif layer.name == "C2fAttn":
                out = m(inp, txt, train)
            elif layer.name == "ImagePoolingAttn":
                txt = m(inp, txt, train)
                out = inp  # reference keeps x unchanged (tasks.py:673)
            elif layer.name == "WorldDetect":
                out = m(inp, text, train)  # ORIGINAL text (tasks.py:671)
            elif layer.name == "CBFuse":
                out = B.cb_fuse(inp, layer.args[0])
            elif layer.name == "nn.MaxPool2d":
                a = layer.args
                k = int(a[0]) if a else 2
                st = int(a[1]) if len(a) > 1 else k
                pd = int(a[2]) if len(a) > 2 else 0
                out = max_pool(inp, k, st, pd)
            elif layer.name == "nn.ZeroPad2d":
                l, r, t, bt = layer.args[0]
                out = jnp.pad(inp, ((0, 0), (t, bt), (l, r), (0, 0)))
            elif layer.name in ("nn.Identity", "Silence"):
                out = inp
            elif layer.name == "MP":
                k = int(layer.args[0]) if layer.args else 2
                out = max_pool(inp, k, k, 0)
            elif layer.name == "SP":
                k = int(layer.args[0]) if layer.args else 3
                out = max_pool(inp, k, 1, k // 2)
            elif isinstance(m, (list, tuple)):
                out = inp
                for sub in m:
                    out = sub(out, train)
            else:
                out = m(inp, train)
            y.append(out if layer.i in self.spec.save else None)
        return out  # Detect raw maps (list of NHWC)


class DetectionModel:
    """User-facing detection model: spec + strides + init/apply helpers.

    Mirrors reference DetectionModel (tasks.py:313): builds from YAML,
    computes per-level strides by probing output shapes, initializes head
    biases with the stride-aware prior (head.py:188 bias_init).
    """

    def __init__(self, cfg="yolov13s_DBL.yaml", ch=3, nc=None, dtype=jnp.float32, verbose=False):
        d = yaml_model_load(cfg) if isinstance(cfg, (str, Path)) else dict(cfg)
        if nc is not None:
            d["nc"] = nc
        self.yaml = d
        self.spec = parse_model_spec(d, ch=ch)
        self.nc = self.spec.nc
        self.dtype = dtype
        self.module = YOLOModel(spec=self.spec, dtype=dtype)
        self.reg_max = 16
        self.head_name = self.spec.layers[-1].name
        self.anchors = self.spec.layers[-1].args[1] if self.head_name == "IDetect" else None
        # RTDETRDecoder consumes the P3/P4/P5 pyramid and is stride-free at
        # decode (boxes are normalized); skip the output-shape probe.
        self.strides = (8, 16, 32) if self.head_name == "RTDETRDecoder" else self._probe_strides(ch)
        self.names = {i: f"{i}" for i in range(self.nc)}

    def _probe_strides(self, ch, probe=256):
        x = jnp.zeros((1, probe, probe, ch), dtype=jnp.float32)
        shapes = jax.eval_shape(
            lambda v, xx: self.module.apply(v, xx, train=False),
            jax.eval_shape(lambda xx: self.module.init(jax.random.PRNGKey(0), xx), x),
            x,
        )
        if isinstance(shapes, dict):  # v10Detect / end2end heads
            shapes = shapes.get("one2one", next(iter(shapes.values())))
        elif isinstance(shapes, tuple) and len(shapes) and not hasattr(shapes[0], "shape"):
            shapes = shapes[0]  # Segment/Pose/OBB (det_maps, aux...) tuples
        return tuple(int(probe // s.shape[1]) for s in shapes)

    def init(self, rng, imgsz=640, batch=1):
        """Initialize variables and apply Detect bias priors."""
        x = jnp.zeros((batch, imgsz, imgsz, 3), dtype=jnp.float32)
        variables = self.module.init(rng, x)
        return self._bias_init(variables)

    def _bias_init(self, variables):
        """Stride-aware head bias init (reference head.py:188)."""
        import flax

        flat = flax.traverse_util.flatten_dict(variables, sep="/")
        det_idx = self.spec.layers[-1].i
        for lvl, s in enumerate(self.strides):
            for key in list(flat):
                if f"m{det_idx}/cv2_{lvl}_2/conv/bias" in key:
                    flat[key] = jnp.ones_like(flat[key])
                if f"m{det_idx}/cv3_{lvl}_2/conv/bias" in key:
                    val = math.log(5 / self.nc / (640 / s) ** 2)
                    flat[key] = jnp.full_like(flat[key], val)
        return flax.traverse_util.unflatten_dict(flat, sep="/")

    def apply(self, variables, x, train=False, mutable=None, rngs=None):
        kwargs = {}
        if mutable is not None:
            kwargs["mutable"] = mutable
        if rngs is not None:
            kwargs["rngs"] = rngs
        return self.module.apply(variables, x, train=train, **kwargs)

    def predict(self, variables, x):
        """Raw maps → decoded (B, 4+nc, A) predictions. For end2end (v10)
        heads the one2one branch is decoded (reference forward_end2end)."""
        feats = self.module.apply(variables, x, train=False)
        return self.decode_outputs(feats, img_size=x.shape[1])

    def decode_outputs(self, feats, img_size=None):
        """Decode already-computed forward outputs (so task predictors that
        need the raw side maps — Segment coeffs, Pose kpt maps — run the
        forward ONCE and decode from it, instead of a second apply)."""
        if isinstance(feats, dict):
            feats = feats["one2one"]
        elif isinstance(feats, tuple) and len(feats) and not hasattr(feats[0], "shape"):
            if self.head_name == "OBB":
                from .heads import decode_obb
                return decode_obb(feats[0], feats[1], self.strides, self.nc, self.reg_max)
            feats = feats[0]
        if self.head_name == "IDetect":
            from .heads import decode_v7
            return decode_v7(feats, self.strides, self.anchors, self.nc)
        if self.head_name == "RTDETRDecoder":
            from ..models.rtdetr import rtdetr_postprocess
            dec_bboxes, dec_scores = feats[0], feats[1]
            return rtdetr_postprocess(dec_bboxes, dec_scores, img_size=img_size)
        return decode_detections(feats, self.strides, self.nc, self.reg_max)

    def predict_tta(self, variables, x):
        """Test-time-augmented prediction (reference DetectionModel
        _predict_augment, tasks.py:361): scales (1, 0.83, 0.67) with flips
        (none, lr, none), de-scaled and concatenated along anchors. Sizes are
        stride-aligned so each variant is its own cached compilation."""
        import jax

        b, h, w, _ = x.shape
        s = max(self.strides)
        outs = []
        for scale, flip in ((1.0, None), (0.83, "lr"), (0.67, None)):
            nh = int((h * scale) // s * s) or s
            nw = int((w * scale) // s * s) or s
            xi = jax.image.resize(x, (b, nh, nw, 3), "linear")
            if flip == "lr":
                xi = xi[:, :, ::-1]
            p = self.predict(variables, xi)  # (B, 4+nc, A)
            boxes, rest = p[:, :4], p[:, 4:]
            gx, gy = w / nw, h / nh
            bx = boxes.at[:, 0].mul(gx).at[:, 2].mul(gx)
            bx = bx.at[:, 1].mul(gy).at[:, 3].mul(gy)
            if flip == "lr":
                bx = bx.at[:, 0].set(w - bx[:, 0])
            p = jnp.concatenate([bx, rest], axis=1)
            outs.append(p)
        return jnp.concatenate(outs, axis=-1)

    def info(self, variables=None):
        n_params = (
            sum(p.size for p in jax.tree_util.tree_leaves(variables["params"])) if variables else None
        )
        return {
            "layers": len(self.spec.layers),
            "parameters": n_params,
            "strides": self.strides,
            "nc": self.nc,
            "scale": self.spec.scale,
        }


class ClassificationModel(DetectionModel):
    """Image classifier under the same YAML compiler (reference tasks.py:452
    ClassificationModel): Classify head → (B, nc) logits. No strides, no
    detect-bias priors."""

    def _probe_strides(self, ch, probe=256):
        return ()

    def _bias_init(self, variables):
        return variables

    def predict(self, variables, x):
        """Logits → (B, nc) softmax probabilities."""
        logits = self.module.apply(variables, x, train=False)
        return jax.nn.softmax(logits, axis=-1)


class WorldModel(DetectionModel):
    """YOLO-World open-vocabulary detector (reference tasks.py:617 WorldModel).

    Text embeddings ride along as a (1, K, 512) array; the reference fills
    them via CLIP — here `set_classes` accepts precomputed embeddings (CLIP is
    unavailable in a zero-egress build) and the default buffer is the same
    random-normal init the reference starts with.
    """

    def __init__(self, cfg="yolov8s-world.yaml", ch=3, nc=None, dtype=jnp.float32, verbose=False):
        import numpy as _np

        self._txt_rng = _np.random.default_rng(0)
        super().__init__(cfg, ch=ch, nc=nc, dtype=dtype, verbose=verbose)
        self.txt_feats = jnp.asarray(
            self._txt_rng.standard_normal((1, self.nc, 512)), jnp.float32)

    def set_classes(self, embeddings, names=None):
        """Install precomputed text embeddings (reference set_classes without
        the CLIP encode step)."""
        emb = jnp.asarray(embeddings, jnp.float32)
        if emb.ndim == 2:
            emb = emb[None]
        self.txt_feats = emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        self.nc = emb.shape[1]
        if names is not None:
            self.names = dict(enumerate(names))

    def _text(self, batch):
        t = self.txt_feats
        return jnp.broadcast_to(t, (batch, *t.shape[1:])) if t.shape[0] != batch else t

    def _probe_strides(self, ch, probe=256):
        x = jnp.zeros((1, probe, probe, ch), dtype=jnp.float32)
        txt = jnp.zeros((1, self.spec.nc, 512), jnp.float32)
        shapes = jax.eval_shape(
            lambda v, xx: self.module.apply(v, xx, train=False, text=txt),
            jax.eval_shape(lambda xx: self.module.init(jax.random.PRNGKey(0), xx, text=txt), x),
            x,
        )
        return tuple(int(probe // s.shape[1]) for s in shapes)

    def init(self, rng, imgsz=640, batch=1):
        x = jnp.zeros((batch, imgsz, imgsz, 3), dtype=jnp.float32)
        variables = self.module.init(rng, x, text=self._text(batch))
        return self._bias_init(variables)

    def apply(self, variables, x, train=False, mutable=None, rngs=None, text=None):
        kwargs = {}
        if mutable is not None:
            kwargs["mutable"] = mutable
        if rngs is not None:
            kwargs["rngs"] = rngs
        t = text if text is not None else self._text(x.shape[0])
        return self.module.apply(variables, x, train=train, text=t, **kwargs)

    def predict(self, variables, x, text=None):
        feats = self.apply(variables, x, text=text)
        return decode_detections(feats, self.strides, self.nc, self.reg_max)
