"""Timing and filesystem tools (reference global_utils/tools.py).

avg_time/check_time (tools.py:110,120) live in utils/benchmarks.py for the
module catalogue; here are the generic pieces: time_sync (device-synced
timestamps), run-dir auto-numbering (tools.py:48 find_new_dir), numeric file
sort (tools.py:63). The reference's WindowsRouser anti-sleep hack
(tools.py:151, kernel32 SetThreadExecutionState) is Windows-only and
meaningless on TPU hosts — provided as a documented no-op for API parity.
"""

from __future__ import annotations

import re
import time
from pathlib import Path
from typing import List

import jax


def time_sync() -> float:
    """Device-synchronized wall clock (reference tools.py time_sync: cuda.synchronize)."""
    # flush all pending device work
    jax.effects_barrier()
    return time.time()


def find_new_dir(base: str, name: str = "exp") -> Path:
    """Auto-numbered run directory: exp, exp2, exp3… (reference tools.py:48)."""
    base = Path(base)
    base.mkdir(parents=True, exist_ok=True)
    cand = base / name
    if not cand.exists():
        return cand
    i = 2
    while (base / f"{name}{i}").exists():
        i += 1
    return base / f"{name}{i}"


def numeric_sort(paths: List) -> List:
    """Sort paths by embedded integers (reference tools.py:63)."""

    def key(p):
        nums = re.findall(r"\d+", Path(p).stem)
        return (int(nums[-1]) if nums else 0, str(p))

    return sorted(paths, key=key)


class WindowsRouser:
    """No-op stand-in for the reference's Windows anti-sleep helper
    (tools.py:151). Kept for API parity; does nothing on Linux/TPU hosts."""

    def start(self):
        return self

    def stop(self):
        return self

    __enter__ = start

    def __exit__(self, *exc):
        self.stop()
        return False
