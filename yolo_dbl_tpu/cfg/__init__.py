"""Layered config system.

Equivalent of the reference's cfg/__init__.py get_cfg/check_cfg
(reference cfg/__init__.py:268,316): default.yaml provides ~100 typed flags,
overrides are merged with type checking, result is an attribute namespace.
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace
from typing import Dict, Optional

import yaml

CFG_DIR = Path(__file__).resolve().parent
DEFAULT_CFG_PATH = CFG_DIR / "default.yaml"

_FLOAT_KEYS = {
    "lr0", "lrf", "momentum", "weight_decay", "warmup_epochs", "warmup_momentum",
    "warmup_bias_lr", "box", "cls", "dfl", "pose", "kobj", "label_smoothing",
    "hsv_h", "hsv_s", "hsv_v", "degrees", "translate", "scale", "shear",
    "perspective", "flipud", "fliplr", "bgr", "mosaic", "mixup", "copy_paste",
    "erasing", "crop_fraction", "fraction", "conf", "iou",
}
_INT_KEYS = {"epochs", "patience", "workers", "seed", "close_mosaic", "max_det", "nbs", "save_period", "vid_stride"}
_BOOL_KEYS = {
    "save", "cache", "exist_ok", "pretrained", "verbose", "deterministic", "single_cls",
    "rect", "cos_lr", "resume", "amp", "profile", "multi_scale", "val", "save_json",
    "half", "plots", "augment", "grad_accumulate", "agnostic_nms", "dynamic", "simplify", "nms",
}


class IterableSimpleNamespace(SimpleNamespace):
    """Namespace that iterates like a dict (reference utils/__init__.py)."""

    def __iter__(self):
        return iter(vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


def load_default_cfg() -> Dict:
    with open(DEFAULT_CFG_PATH) as f:
        return yaml.safe_load(f)


def check_cfg(cfg: Dict) -> Dict:
    """Light type validation mirroring reference check_cfg (cfg/__init__.py:316)."""
    out = {}
    for k, v in cfg.items():
        if v is None:
            out[k] = v
        elif k in _FLOAT_KEYS:
            out[k] = float(v)
        elif k in _INT_KEYS:
            out[k] = int(v)
        elif k in _BOOL_KEYS:
            if not isinstance(v, bool):
                raise TypeError(f"cfg key '{k}' expects bool, got {type(v).__name__}={v!r}")
            out[k] = v
        else:
            out[k] = v
    return out


def get_cfg(cfg: Optional[Dict] = None, overrides: Optional[Dict] = None) -> IterableSimpleNamespace:
    """Merge default config with overrides into a typed namespace."""
    merged = load_default_cfg()
    if cfg:
        merged.update(dict(cfg))
    if overrides:
        unknown = set(overrides) - set(merged)
        if unknown:
            raise KeyError(f"unknown cfg keys: {sorted(unknown)}; valid keys come from default.yaml")
        merged.update(overrides)
    return IterableSimpleNamespace(**check_cfg(merged))
