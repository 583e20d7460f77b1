"""Device mesh and sharding helpers.

TPU-native replacement for the reference's DDP orchestration (§2.12 of
SURVEY.md): instead of subprocess-per-GPU + NCCL all-reduce
(utils/dist.py:56, trainer.py:217-228), training is one SPMD program over a
`jax.sharding.Mesh`. Axes:

  data  — batch sharding (the reference's only parallelism, DDP);
  model — reserved tensor-parallel axis (designed in per SURVEY §2.12 even
          though the reference never exercises TP; channel-sharded convs /
          spatially-sharded activations ride this axis via GSPMD).

Gradient all-reduce and cross-replica BatchNorm statistics are inserted by
XLA automatically because jit sees the global batch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {len(devices)}"
    )
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    ds = data_sharding(mesh)
    return {k: jax.device_put(v, ds) if hasattr(v, "shape") else v for k, v in batch.items()}
