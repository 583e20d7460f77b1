"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is how multi-chip sharding is tested without a real TPU slice
(SURVEY.md §4): XLA's host platform is split into 8 virtual devices, so
pjit/shard_map programs compile and execute with real collectives.

Note: in this image the 'axon' TPU plugin ignores JAX_PLATFORMS (its
sitecustomize registers it in every interpreter), so pinning the platform
is not enough: when the TPU tunnel is down, the plugin's client init
retries forever and the whole test session hangs at the first
jax.devices() call. The test lane never wants the real chip anyway, so we
deregister the plugin factory outright before any backend init.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

try:  # drop the axon TPU plugin before first backend init (see docstring)
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

# sitecustomize imports jax before this file runs, so the env var above is
# too late for jax.config's captured default — update it directly.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

try:
    _cpus = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpus[0])
except RuntimeError:
    pass

# Persistent XLA compilation cache: this box has ONE cpu core, so the fast
# lane is compile-dominated. With the cache warm the default lane runs in
# ~11-12 min on this box (TESTS_r3.txt); cold adds recompiles on top.
# Repo-local dir, .gitignore'd.
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cpu_devices(n=8):
    return jax.devices("cpu")[:n]


import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (live-torch parity, zoo rebuilds)",
    )
    parser.addoption(
        "--runheavy", action="store_true", default=False,
        help="also run tests marked compileheavy (full-zoo traces, export "
             "round-trips, e2e train steps — the nightly lane; see TESTS_r3.txt)",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: live-torch parity / long e2e (--runslow)")
    config.addinivalue_line(
        "markers",
        "compileheavy: full-model trace/compile heavy; default lane skips "
        "(--runheavy; nightly = pytest --runslow --runheavy)",
    )


def pytest_collection_modifyitems(config, items):
    skip_slow = pytest.mark.skip(reason="slow: use --runslow")
    skip_heavy = pytest.mark.skip(
        reason="compileheavy: use --runheavy (default lane stays fast; "
               "nightly lane runs --runslow --runheavy)")
    for item in items:
        if "slow" in item.keywords and not config.getoption("--runslow"):
            item.add_marker(skip_slow)
        if "compileheavy" in item.keywords and not config.getoption("--runheavy"):
            item.add_marker(skip_heavy)
