"""Tensor- and spatial-parallel sharding rules over the ('data','model') mesh.

The reference has DP only (SURVEY §2.12); the TPU build designs the extra
axes in. GSPMD does the heavy lifting: we ANNOTATE where parameters and
activations live, XLA inserts the all-gathers / reduce-scatters / halo
exchanges. Two modes ride the 'model' axis:

- **TP (channel sharding)**: large conv kernels shard alternately on their
  output-channel (HWIO minor) and input-channel dims, Megatron
  column→row-parallel style: an O-sharded conv leaves its activation
  channel-sharded, the next I-sharded conv contracts that sharded dim and
  GSPMD closes the pair with ONE psum — instead of an all-gather after
  every layer (uniform-O rule, kept as alternate=False). Param creation
  order within a block (cv1 → cv2 → ...) is dataflow order, so
  natural-sorted path order approximates the chain; where a concat or
  replicated producer breaks the pattern, GSPMD inserts the resharding and
  numerics stay exact (test_parallel_tp.py asserts parity on the DBL
  flagship). Small params replicate (collective cost would exceed the
  memory win).
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


def _natural_key(path: str):
    """Sort key treating digit runs numerically (layers_2 < layers_10)."""
    import re

    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", path)]


def _leaf_spec(path: str, leaf, n_model: int, min_size: int,
               shard_in: bool = False) -> P:
    if leaf.ndim == 0 or leaf.size < min_size:
        return P()
    if leaf.ndim == 4:  # conv kernel HWIO
        if shard_in and leaf.shape[2] % n_model == 0:
            return P(None, None, "model", None)  # row-parallel: contract + psum
        if leaf.shape[-1] % n_model == 0:
            return P(None, None, None, "model")  # column-parallel
        return P()
    if leaf.shape[-1] % n_model != 0:
        return P()
    if leaf.ndim == 2:  # dense (in, out) → shard out
        return P(None, "model")
    if leaf.ndim == 1:  # bias / BN vectors follow their conv's O sharding
        return P("model")
    return P()


def model_parallel_shardings(
    variables: Dict[str, Any], mesh: Mesh, min_size: int = 1 << 14,
    alternate: bool = True
) -> Dict[str, Any]:
    """Per-leaf NamedSharding pytree for TP over the 'model' axis.

    Eligible conv kernels alternate column-parallel (O) / row-parallel (I)
    in natural path order — consecutive heavy convs then cost one psum per
    pair instead of an all-gather per layer. alternate=False keeps the
    round-2 uniform-O rule. Parameters smaller than `min_size` elements
    replicate — sharding them costs more in collectives than it saves in
    HBM. With n_model == 1 this degrades to full replication (DP-only).
    """
    n_model = model_axis_size(mesh)

    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    # The alternation counter must be keyed on the KERNEL, not the flattened
    # leaf: a TrainState carries several structurally-identical copies of
    # every kernel (params, ema_params, Adam mu/nu, MultiSteps acc_grads) and
    # a single counter across the whole flatten would give copies of the same
    # kernel opposite O/I assignments whenever the eligible count is odd —
    # elementwise Adam/EMA updates between differently-sharded operands then
    # reshard every step. Canonical id = the trailing run of dict-key path
    # segments (the flax module path), which is identical across all copies
    # of one kernel and unique between kernels.
    def _canonical_id(path):
        segs = []
        for seg in reversed(path):
            if isinstance(seg, jax.tree_util.DictKey):
                segs.append(str(seg.key))
            else:
                break
        return tuple(reversed(segs))

    ids = [_canonical_id(p) for p, _ in flat]
    shard_ids = set()
    if alternate and n_model > 1:
        elig = {}
        for (p, leaf), cid in zip(flat, ids):
            if (leaf.ndim == 4 and leaf.size >= min_size
                    and leaf.shape[-1] % n_model == 0):
                elig.setdefault(cid, leaf)
        parity = 0
        for cid in sorted(elig, key=lambda c: _natural_key("/".join(c))):
            if parity % 2 == 1 and elig[cid].shape[2] % n_model == 0:
                shard_ids.add(cid)
            parity += 1
    shard_in_flags = [cid in shard_ids for cid in ids]

    def spec(i, path, leaf):
        if n_model == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _leaf_spec(path, leaf, n_model, min_size,
                                              shard_in=shard_in_flags[i]))

    mapped = [spec(i, jax.tree_util.keystr(p), l) for i, (p, l) in enumerate(flat)]
    return jax.tree_util.tree_unflatten(treedef, mapped)


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
