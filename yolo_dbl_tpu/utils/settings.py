"""Persistent user settings + logger.

Equivalent of the reference's SettingsManager (utils/__init__.py:1155 —
JSONDict persisted to ~/.config/Ultralytics/settings.json) and the
rank-aware LOGGER setup (utils/__init__.py:329,392).
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict

LOGGER = logging.getLogger("yolo_dbl_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(logging.INFO if int(os.environ.get("RANK", 0)) in (0, -1) else logging.ERROR)

DEFAULT_SETTINGS = {
    "settings_version": "1.0.0",
    "datasets_dir": "datasets",
    "weights_dir": "weights",
    "runs_dir": "runs",
    "sync": False,
    "tensorboard": False,
    "wandb": False,
    "mlflow": False,
}


class SettingsManager(dict):
    """JSON-backed settings dict (reference utils/__init__.py:1155)."""

    def __init__(self, path: str = "~/.config/yolo_dbl_tpu/settings.json"):
        super().__init__()
        self.path = Path(path).expanduser()
        self.update(DEFAULT_SETTINGS)
        if self.path.is_file():
            try:
                with open(self.path) as f:
                    self.update(json.load(f))
            except (json.JSONDecodeError, OSError):
                pass
        else:
            self.save()

    def save(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(dict(self), f, indent=2)

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)

    def reset(self):
        self.clear()
        self.update(DEFAULT_SETTINGS)
        self.save()


# Lazily-created singleton (reference SETTINGS at utils/__init__.py:1199):
# module import must not touch the filesystem; first attribute access does.
class _LazySettings:
    _inst: SettingsManager | None = None

    def _get(self) -> SettingsManager:
        if _LazySettings._inst is None:
            _LazySettings._inst = SettingsManager()
        return _LazySettings._inst

    def __getitem__(self, k):
        return self._get()[k]

    def __setitem__(self, k, v):
        s = self._get()
        s[k] = v
        s.save()

    def __iter__(self):
        return iter(self._get())

    def __len__(self):
        return len(self._get())

    def keys(self):
        return self._get().keys()

    def items(self):
        return self._get().items()

    def __repr__(self):
        return repr(dict(self._get()))


SETTINGS = _LazySettings()
