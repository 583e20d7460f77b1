"""Shared logging (reference utils/__init__.py LOGGER:392, rank-aware).

`verbose=False` in the config drops the engine's info messages to warnings
only — the same contract as the reference's `verbose` flag (set_logging).
"""

from __future__ import annotations

import logging

LOGGER = logging.getLogger("yolo_dbl_tpu")
if not LOGGER.handlers:  # idempotent under re-import
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(logging.INFO)
    LOGGER.propagate = False


def set_verbosity(verbose: bool) -> None:
    """Map the cfg `verbose` flag to the package logger level."""
    LOGGER.setLevel(logging.INFO if verbose else logging.WARNING)
