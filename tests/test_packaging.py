"""Packaging metadata stays consistent with the package.

The distribution (pyproject.toml) must carry the YAML model/dataset configs
and the native loader source as package data (both are runtime inputs:
the YAML->model compiler and the JIT-built C++ decode pool), and the
console entrypoint must resolve. Equivalent surface in the reference:
ultralytics' pip distribution + `yolo` console script (cfg/__init__.py:817).
"""

import tomllib
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _project():
    with open(ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def test_version_matches_package():
    import yolo_dbl_tpu

    assert _project()["version"] == yolo_dbl_tpu.__version__


def test_console_script_resolves():
    target = _project()["scripts"]["yolo-dbl"]
    mod_name, func_name = target.split(":")
    import importlib

    fn = getattr(importlib.import_module(mod_name), func_name)
    assert callable(fn)


def test_package_data_globs_cover_runtime_inputs():
    with open(ROOT / "pyproject.toml", "rb") as f:
        data = tomllib.load(f)["tool"]["setuptools"]["package-data"]["yolo_dbl_tpu"]
    pkg = ROOT / "yolo_dbl_tpu"
    # the flagship config and the native source must be matched by the globs
    flagship = pkg / "cfg" / "models" / "v13" / "yolov13_DBL.yaml"
    native = pkg / "native" / "src" / "loader.cc"
    assert flagship.exists() and native.exists()
    matched = {p for g in data for p in pkg.glob(g)}
    assert flagship in matched
    assert native in matched
    # every yaml under cfg/ ships
    missing = [p for p in (pkg / "cfg").rglob("*.yaml") if p not in matched]
    assert not missing, f"yamls not covered by package-data: {missing[:5]}"
