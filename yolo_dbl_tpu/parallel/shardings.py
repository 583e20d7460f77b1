"""Tensor- and spatial-parallel sharding rules over the ('data','model') mesh.

The reference has DP only (SURVEY §2.12); the TPU build designs the extra
axes in. GSPMD does the heavy lifting: we ANNOTATE where parameters and
activations live, XLA inserts the all-gathers / reduce-scatters / halo
exchanges. Two modes ride the 'model' axis:

- **TP (channel sharding)**: large conv kernels shard their output-channel
  (HWIO minor) dim; matching BN/bias vectors shard too; paired Dense kernels
  shard (in, out) alternately would need op knowledge, so we keep the simple
  uniform rule — out-dim sharded, XLA re-gathers activations where needed.
  Small params replicate (collective cost would exceed the memory win).
- **SP (spatial sharding)**: NHWC activations shard H over 'model'
  (`spatial_sharding`); XLA inserts halo exchanges for the convs. This is
  the image-domain analogue of sequence parallelism (SURVEY §5 note) and is
  how >8k-resolution inputs fit a chip.

Both compose with the 'data' axis; `dryrun_multichip` exercises DP x TP on
the virtual CPU mesh every round.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get("model", 1)


def _leaf_spec(path: str, leaf, n_model: int, min_size: int) -> P:
    if leaf.ndim == 0 or leaf.size < min_size:
        return P()
    out_dim = leaf.shape[-1]
    if out_dim % n_model != 0:
        return P()
    if leaf.ndim == 4:  # conv kernel HWIO → shard O
        return P(None, None, None, "model")
    if leaf.ndim == 2:  # dense (in, out) → shard out
        return P(None, "model")
    if leaf.ndim == 1:  # bias / BN vectors follow their conv's O sharding
        return P("model")
    return P()


def model_parallel_shardings(
    variables: Dict[str, Any], mesh: Mesh, min_size: int = 1 << 14
) -> Dict[str, Any]:
    """Per-leaf NamedSharding pytree for TP over the 'model' axis.

    Parameters smaller than `min_size` elements replicate — sharding them
    costs more in collectives than it saves in HBM. With n_model == 1 this
    degrades to full replication (the DP-only case).
    """
    n_model = model_axis_size(mesh)

    def spec(path, leaf):
        if n_model == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _leaf_spec(path, leaf, n_model, min_size))

    flat = jax.tree_util.tree_flatten_with_path(variables)
    mapped = [spec(jax.tree_util.keystr(p), l) for p, l in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], mapped)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded over data AND rows over 'model' (SP): XLA inserts
    conv halo exchanges. Use for inputs too large for one chip's HBM."""
    return NamedSharding(mesh, P("data", "model"))


def shard_variables(variables, mesh: Mesh, min_size: int = 1 << 14):
    """Place a variables pytree according to model_parallel_shardings."""
    sh = model_parallel_shardings(variables, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, variables, sh)
