"""Pipeline-parallel RT-DETR decoding: the 6-layer deformable decoder
streamed through the GPipe executor (parallel/pipeline.py) over the mesh
'model' axis.

The decoder is the second PP target this framework names (after the SAM ViT
trunk, models/sam_pp.py): layers are homogeneous (reference
transformer.py DeformableTransformerDecoder — same DeformableDecoderLayer
repeated ndl times), but unlike a plain trunk the carried state is a PYTREE
— {tgt (B,Q,C), refer (B,Q,4), per-level value pyramid} — with the
per-layer bbox-refinement head folded into each stage. pipeline_apply
carries arbitrary activation pytrees, so a stage is: shared query-pos MLP →
decoder layer → this layer's bbox head → iterative box refinement.

The cheap non-repeating parts (input projections + BN, anchor generation,
encoder head, top-k query selection, the final score head) run replicated
outside the pipeline, mirroring models/rtdetr.py RTDETRDecoder.__call__
at inference (reference head.py:537 RTDETRDecoder.forward eval branch).
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..parallel.pipeline import pipeline_apply, stack_stage_params
from .rtdetr import DeformableDecoderLayer, RTDETRDecoder, _MLP, _inverse_sigmoid


def decode_pipelined(
    decoder: RTDETRDecoder,
    variables: Any,
    feats: List[jnp.ndarray],
    mesh: Mesh,
    n_micro: int = 4,
    axis: str = "model",
):
    """RTDETRDecoder.apply(variables, feats) at inference, with the layer
    stack pipelined over `mesh[axis]` (ndl % n_stages == 0; a stage holds
    ndl/n_stages consecutive layers). Returns the final-layer
    (dec_bboxes (B, Q, 4), dec_scores (B, Q, nc)) — the pair inference
    consumes (rtdetr_postprocess reads dec[:, -1]). Output parity with the
    sequential decoder is pinned by tests/test_parallel_pp.py."""
    n_stages = mesh.shape[axis]
    if decoder.ndl % n_stages:
        raise ValueError(f"ndl {decoder.ndl} not divisible into {n_stages} stages")
    per = decoder.ndl // n_stages
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    hd, nc, dt = decoder.hd, decoder.nc, decoder.dtype
    b = feats[0].shape[0]
    nl = len(feats)

    # --- replicated prologue (mirrors rtdetr.py __call__ lines 146-197,
    # train=False so BN uses running stats and nothing is stop-gradiented) --
    proj = []
    for i, f in enumerate(feats):
        y = nn.Conv(hd, (1, 1), use_bias=False, dtype=dt).apply(
            {"params": params[f"input_proj_{i}_0"]}, f)
        y = nn.BatchNorm(use_running_average=True, dtype=dt).apply(
            {"params": params[f"input_proj_{i}_1"],
             "batch_stats": stats[f"input_proj_{i}_1"]}, y)
        proj.append(y)
    shapes = [p.shape[1:3] for p in proj]
    memory = jnp.concatenate([p.reshape(b, -1, hd) for p in proj], axis=1)

    anchors = []
    for lvl, (h, w) in enumerate(shapes):
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        xy = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1).reshape(-1, 2)
        wh = jnp.full((h * w, 2), 0.05 * (2.0**lvl))
        anchors.append(jnp.concatenate([xy, wh], -1))
    anchors = jnp.concatenate(anchors)[None]
    valid = ((anchors > 0.01) & (anchors < 0.99)).all(-1, keepdims=True)
    anchors_logit = jnp.where(valid, jnp.log(anchors / (1 - anchors)), jnp.inf)
    masked_memory = jnp.where(valid, memory, 0.0)

    enc_out = nn.LayerNorm(epsilon=1e-5, dtype=dt).apply(
        {"params": params["enc_output_1"]},
        nn.Dense(hd, dtype=dt).apply({"params": params["enc_output_0"]},
                                     masked_memory))
    enc_scores = nn.Dense(nc, dtype=dt).apply(
        {"params": params["enc_score_head"]}, enc_out)
    enc_bbox_delta = _MLP(hd, 4, dtype=dt).apply(
        {"params": params["enc_bbox_head"]}, enc_out)
    enc_bboxes_logit = enc_bbox_delta + anchors_logit
    nq = min(decoder.nq, enc_scores.shape[1])
    _, topi = jax.lax.top_k(enc_scores.max(-1), nq)
    ref_logit = jnp.take_along_axis(enc_bboxes_logit, topi[..., None], axis=1)
    refer = jax.nn.sigmoid(ref_logit)
    tgt = jnp.take_along_axis(enc_out, topi[..., None], axis=1)

    # --- pipelined layer stack -------------------------------------------
    pos_head = _MLP(2 * hd, hd, layers=2, dtype=dt)
    layer = DeformableDecoderLayer(hd, decoder.nh, nl, decoder.ndp, dtype=dt)
    bbox_head = _MLP(hd, 4, dtype=dt)

    def stage_fn(sp, act):
        t, r = act["tgt"], act["refer"]
        vals = [act[f"v{i}"] for i in range(nl)]
        for j in range(per):
            pos = pos_head.apply({"params": sp["pos"]}, r)
            t = layer.apply({"params": sp[f"layer{j}"]}, t, r, vals, pos)
            delta = bbox_head.apply({"params": sp[f"bbox{j}"]}, t)
            r = jax.nn.sigmoid(delta + _inverse_sigmoid(r))
        return {**act, "tgt": t, "refer": r}

    per_stage = [
        {"pos": params["query_pos_head"],  # shared head, replicated per stage
         **{f"layer{j}": params[f"decoder_layers_{s * per + j}"] for j in range(per)},
         **{f"bbox{j}": params[f"dec_bbox_head_{s * per + j}"] for j in range(per)}}
        for s in range(n_stages)
    ]
    act = {"tgt": tgt, "refer": refer, **{f"v{i}": v for i, v in enumerate(proj)}}
    out = pipeline_apply(stage_fn, stack_stage_params(per_stage), act, mesh,
                         n_micro=n_micro, axis=axis)

    # --- replicated epilogue: last layer's score head --------------------
    scores = nn.Dense(nc, dtype=dt).apply(
        {"params": params[f"dec_score_head_{decoder.ndl - 1}"]}, out["tgt"])
    return out["refer"], scores
