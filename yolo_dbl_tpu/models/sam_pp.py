"""Pipeline-parallel SAM image encoding: the ViT trunk streamed through the
GPipe executor (parallel/pipeline.py) over the mesh 'model' axis.

SAM's encoder is the textbook PP target in this framework: a deep
homogeneous transformer trunk with constant (B, g, g, C) activations, where
the [win, ..., global] attention pattern repeats periodically
(SAM-B: [w, w, g] x 4 — encoders.py global_attn_indexes=(2, 5, 8, 11);
reference counterpart: /root/reference .../models/sam/modules/encoders.py
Block stack, DDP-replicated there). A stage is one period, so every stage
runs the same traced function over its own stacked parameter slice.

Patch embed + abs-pos and the conv neck are cheap (one conv each) and run
replicated outside the pipeline.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax.sharding import Mesh

from ..parallel.pipeline import pipeline_apply, stack_stage_params
from .sam import ImageEncoderViT, LayerNorm2d, _ViTBlock

try:  # flax>=0.8 keeps nn in linen
    from flax import linen as nn
except ImportError:  # pragma: no cover
    import flax.nn as nn


def _stage_pattern(encoder: ImageEncoderViT, n_stages: int) -> list:
    """Window sizes per block position within a stage; raises if the block
    pattern does not repeat per stage (PP requires homogeneous stages)."""
    depth = encoder.depth
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible into {n_stages} stages")
    per = depth // n_stages
    ws = [0 if i in encoder.global_attn_indexes else encoder.window_size
          for i in range(depth)]
    pattern = ws[:per]
    for s in range(1, n_stages):
        if ws[s * per:(s + 1) * per] != pattern:
            raise ValueError(
                f"attention pattern {ws} is not periodic with period {per}; "
                f"choose n_stages so each stage holds one full period")
    return pattern


def encode_image_pipelined(
    encoder: ImageEncoderViT,
    variables: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    n_micro: int = 4,
    axis: str = "model",
) -> jnp.ndarray:
    """ImageEncoderViT.apply(variables, x), with the block trunk pipelined
    over `mesh[axis]` (n_stages = axis size). Exact output parity with the
    sequential encoder is pinned by tests/test_parallel_pp.py."""
    n_stages = mesh.shape[axis]
    pattern = _stage_pattern(encoder, n_stages)
    per = len(pattern)
    g = encoder.img_size // encoder.patch_size
    params = variables["params"]

    # --- replicated prologue: patch embed + abs pos ---------------------
    h = nn.Conv(encoder.embed_dim, (encoder.patch_size,) * 2,
                strides=(encoder.patch_size,) * 2, padding="VALID",
                dtype=encoder.dtype, name="patch_embed").apply(
        {"params": params["patch_embed"]}, x)
    h = h + params["pos_embed"]

    # --- pipelined trunk ------------------------------------------------
    blocks = [
        _ViTBlock(encoder.embed_dim, encoder.num_heads, pattern[j], (g, g),
                  dtype=encoder.dtype)
        for j in range(per)
    ]

    def stage_fn(stage_params, a):
        for j, blk in enumerate(blocks):
            a = blk.apply({"params": stage_params[f"b{j}"]}, a)
        return a

    per_stage = [
        {f"b{j}": params[f"block{s * per + j}"] for j in range(per)}
        for s in range(n_stages)
    ]
    h = pipeline_apply(stage_fn, stack_stage_params(per_stage), h, mesh,
                       n_micro=n_micro, axis=axis)

    # --- replicated neck ------------------------------------------------
    h = nn.Conv(encoder.out_chans, (1, 1), use_bias=False, dtype=encoder.dtype,
                name="neck_conv1").apply({"params": params["neck_conv1"]}, h)
    h = LayerNorm2d(dtype=encoder.dtype).apply(
        {"params": params["neck_ln1"]}, h)
    h = nn.Conv(encoder.out_chans, (3, 3), padding=1, use_bias=False,
                dtype=encoder.dtype, name="neck_conv2").apply(
        {"params": params["neck_conv2"]}, h)
    return LayerNorm2d(dtype=encoder.dtype).apply(
        {"params": params["neck_ln2"]}, h)
