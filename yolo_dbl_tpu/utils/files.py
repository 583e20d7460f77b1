"""Run-directory and file helpers (reference utils/files.py)."""

from __future__ import annotations

from pathlib import Path


def increment_path(path, exist_ok: bool = False, sep: str = "") -> Path:
    """Return `path` or, when it exists and exist_ok=False, the next free
    `path{sep}2`, `path{sep}3`, … (reference utils/files.py increment_path —
    the run-dir auto-numbering behind project/name + exist_ok)."""
    path = Path(path)
    if not path.exists() or exist_ok:
        return path
    suffix = path.suffix
    stem = path if suffix == "" else path.with_suffix("")
    for n in range(2, 9999):
        p = Path(f"{stem}{sep}{n}{suffix}")
        if not p.exists():
            return p
    raise FileExistsError(f"no free increment for {path}")
