"""Pipeline parallelism (PP): a GPipe-style stage executor over the mesh.

The reference scales with DDP only (SURVEY §2.12); this framework designs
the extra mesh axes in. TP/SP live in shardings.py; this module adds the
pipeline axis for DEPTH-wise scaling: a homogeneous stack of blocks (the
shape transformers take — SAM/SAM2 ViT encoders, RT-DETR decoder layers) is
split into S stages, each stage's parameters live on one slice of the mesh
axis, and microbatches stream through with `jax.lax.ppermute` hops — the
TPU-idiomatic schedule (shard_map + collective-permute riding ICI), not a
port of torch's Pipe/RPC machinery.

Schedule: GPipe fill-drain. With S stages and M microbatches the loop runs
M + S - 1 ticks; device s computes microbatch t - s at tick t (when in
range) and ppermutes its activation to device s + 1. Bubble fraction is
(S - 1) / (M + S - 1) — callers pick M >= 4 * S to keep it under ~20%.

Constraints (by construction of the stacked-params trick):
  - every stage must run the SAME traced function (homogeneous stage
    structure — e.g. SAM-B's [win, win, global] block pattern repeats 4x,
    so stage = 3 blocks);
  - the activation keeps one pytree structure + shapes across stages
    (true for transformer trunks; RT-DETR carries {tgt, refer, value
    pyramid} — any pytree of arrays works, models/rtdetr_pp.py).

Weights for stage s are `jax.tree.map(lambda p: p[s], stacked)`, i.e. the
caller stacks per-stage params on a new leading axis; under shard_map that
axis is sharded over the pipeline mesh axis so each device materializes only
its own stage — the memory point of PP.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(per_stage: list) -> Any:
    """Stack a list of identically-structured stage param pytrees along a new
    leading axis (the pipeline axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: Any,
    mesh: Mesh,
    n_micro: int,
    axis: str = "model",
) -> Any:
    """Run x through S pipelined stages over `mesh[axis]`.

    stage_fn(params_s, act) -> act; act is any pytree of arrays whose
    structure and shapes are preserved by the stage (a lone ndarray is the
    simple case).
    stacked_params: pytree with leading stage axis of size S = mesh[axis].
    x: pytree of (B, ...) arrays; B must divide into n_micro microbatches.
    Returns stage_{S-1}(...stage_0(x)) exactly (parity tested vs the
    sequential loop in tests/test_parallel_pp.py).
    """
    s_stages = mesh.shape[axis]
    b = jax.tree.leaves(x)[0].shape[0]
    assert b % n_micro == 0, f"batch {b} must divide into {n_micro} microbatches"
    mb = b // n_micro
    micro = jax.tree.map(lambda a: a.reshape(n_micro, mb, *a.shape[1:]), x)

    def body(params, micro_in):
        # params: this device's stage slice (leading axis length 1)
        params = jax.tree.map(lambda p: p[0], params)
        sidx = jax.lax.axis_index(axis)
        n_ticks = n_micro + s_stages - 1

        # Rotating buffer: each device holds one in-flight activation pytree.
        act0 = jax.tree.map(lambda m: jnp.zeros_like(m[0]), micro_in)
        outs0 = jax.tree.map(jnp.zeros_like, micro_in)
        perm = [(i, (i + 1) % s_stages) for i in range(s_stages)]

        def tick(t, carry):
            act, outs = carry
            # stage 0 injects microbatch t (other stages keep their act)
            inject = jnp.where(t < n_micro, t, 0)
            act = jax.tree.map(
                lambda m, a: jnp.where(sidx == 0, m[inject], a), micro_in, act)
            # devices with valid work: stage s works on microbatch t - s
            m_idx = t - sidx
            valid = (m_idx >= 0) & (m_idx < n_micro)
            new_act = stage_fn(params, act)
            act = jax.tree.map(lambda n, a: jnp.where(valid, n, a), new_act, act)
            # last stage banks its finished microbatch
            bank = (sidx == s_stages - 1) & valid
            slot = jnp.clip(m_idx, 0, n_micro - 1)
            outs = jax.tree.map(
                lambda o, a: jnp.where(
                    bank, jax.lax.dynamic_update_index_in_dim(o, a, slot, 0), o),
                outs, act)
            # hand activations down the pipe (ring permute; the wraparound
            # value arriving at stage 0 is overwritten by the next inject)
            act = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), act)
            return act, outs

        _, outs = jax.lax.fori_loop(0, n_ticks, tick, (act0, outs0))
        # every device returns outs; only the last stage's is real. psum after
        # masking keeps the output replicated without a host gather.
        outs = jax.tree.map(
            lambda o: jnp.where(sidx == s_stages - 1, o, jnp.zeros_like(o)), outs)
        return jax.lax.psum(outs, axis)

    import inspect

    try:
        from jax import shard_map
    except ImportError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map

    kw = {"check_rep": False}
    if "check_rep" not in inspect.signature(shard_map).parameters:
        kw = {"check_vma": False}  # jax >= 0.8 rename
    repl_specs = jax.tree.map(lambda m: P(*([None] * m.ndim)), micro)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), repl_specs),
        out_specs=repl_specs,
        **kw,
    )
    outs = fn(stacked_params, micro)
    return jax.tree.map(lambda o: o.reshape(b, *o.shape[2:]), outs)
