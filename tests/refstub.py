"""Import helper for the torch reference at /root/reference (parity oracle).

The reference's vendored ultralytics fork imports many research deps (timm,
triton, torchvision, thop, ...) that are absent here. This installs minimal
permissive stand-ins so the *model-construction* code paths import; only
param counts / module structure are compared — never executed outputs from
stubbed modules.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference/models/YOLO"

_MISSING = [
    "MNN", "anyup", "anyup.utils", "anyup.utils.visualization", "basicsr",
    "basicsr.version", "clip", "coremltools", "fairscale", "fairscale.nn",
    "fairscale.nn.checkpoint", "flash_attn", "flash_attn.flash_attn_interface",
    "flash_attn.modules", "flash_attn.modules.mha", "mct_quantizers", "mmengine",
    "mmengine.model", "ncnn", "onnxruntime", "openvino", "paddle",
    "paddle.inference", "pywt", "pywt.data", "sony_custom_layers",
    "sony_custom_layers.pytorch", "sony_custom_layers.pytorch.object_detection",
    "tensorrt", "tflite_runtime", "tflite_runtime.interpreter", "thop",
    "imagesize", "seaborn", "joblib",
    "timm", "timm.layers", "timm.models", "timm.models.layers", "timm.models.registry",
    "timm.data", "timm.layers.create_act", "timm.layers.create_conv2d",
    "timm.layers.helpers", "timm.layers.mlp", "timm.layers.norm",
    "timm.models.maxxvit", "timm.models.vision_transformer", "torchsummary",
    "torchvision", "torchvision.ops", "torchvision.transforms", "triton",
    "triton.language", "triton.backends", "triton.backends.compiler",
    "triton.compiler", "triton.compiler.compiler", "triton.runtime",
    "triton.runtime.autotuner", "triton.runtime.jit",
    "wandb", "einops.layers.torch", "pytorch_wavelets",
    "model", "model.BasicBlock", "model.PGCU", "model.SFAU", "old", "old.module",
]

_installed = False


def install_stubs():
    global _installed
    if _installed:
        return
    import torch.nn as nn

    class _Permissive(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)

            class _Stub(nn.Identity):
                def __init__(self, *a, **k):
                    super().__init__()

            _Stub.__name__ = name
            return _Stub

    def fake_module(name, **attrs):
        import importlib.machinery as _mach

        m = _Permissive(name)
        m.__path__ = []
        m.__spec__ = _mach.ModuleSpec(name, loader=None, is_package=True)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        parent, _, child = name.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], child, m)
        return m

    for name in _MISSING:
        if name not in sys.modules:
            fake_module(name)

    # functional pieces some module files actually call at import time
    class LayerNorm2d(nn.GroupNorm):
        def __init__(self, ch):
            super().__init__(1, ch)

    class DropPath(nn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    tl = sys.modules["timm.layers"]
    tl.LayerNorm2d = LayerNorm2d
    tl.DropPath = DropPath
    tl.to_2tuple = lambda x: (x, x) if not isinstance(x, (tuple, list)) else tuple(x)
    tl.trunc_normal_ = lambda *a, **k: None
    tml = sys.modules["timm.models.layers"]
    tml.DropPath = DropPath
    tml.to_2tuple = tl.to_2tuple
    tml.trunc_normal_ = tl.trunc_normal_
    sys.modules["timm.models.registry"].register_model = lambda f: f

    tv = sys.modules["torchvision"]
    tv.__version__ = "0.15.0"
    sys.modules["thop"].profile = lambda *a, **k: (0, 0)

    tr = sys.modules["triton"]
    tr.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    tr.autotune = lambda *a, **k: (lambda f: f)
    tr.heuristics = lambda *a, **k: (lambda f: f)
    tr.Config = dict
    tr.cdiv = lambda a, b: -(-a // b)
    trl = sys.modules["triton.language"]
    trl.constexpr = type("constexpr", (), {"__class_getitem__": classmethod(lambda c, i: c)})

    import importlib.metadata as md

    _orig = md.version

    def fake_version(name):
        try:
            return _orig(name)
        except md.PackageNotFoundError:
            return "99.0.0"

    md.version = fake_version

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _installed = True


def load_reference_model(yaml_path: str, scale: str, nc: int = 80):
    """Build the reference torch DetectionModel for a given yaml/scale.

    The reference's parse_model MUTATES a process-global on yamls with an
    `activation:` override (tasks.py:965 `Conv.default_act = eval(act)` —
    e.g. v6 sets ReLU), which would silently corrupt every torch model
    built afterwards in this process; snapshot and restore it."""
    install_stubs()
    import yaml as _yaml

    from ultralytics.nn.modules import Conv
    from ultralytics.nn.tasks import DetectionModel  # noqa: reference import

    with open(yaml_path) as f:
        d = _yaml.safe_load(f)
    d["scale"] = scale
    saved_act = Conv.default_act
    try:
        return DetectionModel(d, nc=nc, verbose=False)
    finally:
        Conv.default_act = saved_act
