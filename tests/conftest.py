"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is how multi-chip sharding is tested without a real TPU slice
(SURVEY.md §4): XLA's host platform is split into 8 virtual devices, so
pjit/shard_map programs compile and execute with real collectives.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
