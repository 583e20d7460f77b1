"""Torch-state_dict → flax-variables weight porting.

The reference ships torch checkpoints (reference engine/trainer.py:513 ckpt
dict; nn/tasks.py:804 torch_safe_load). Our models were built at exact param
parity with matching submodule names, so a systematic rename maps every torch
parameter onto the flax tree:

- torch ``model.{i}.…`` → flax layer ``m{i}`` (outer repeats ``model.{i}.{j}``
  → ``m{i}_{j}``, matching the compiler's expansion at nn/tasks.py:453);
- torch ModuleList/Sequential numeric children merge into the parent name
  with an underscore (``cv3.0.1.conv`` → ``cv3_0_1/conv``);
- conv weights transpose OIHW→HWIO, linear weights (O,I)→(I,O);
- BatchNorm ``weight/bias`` → params ``scale/bias``; ``running_mean/var`` →
  batch_stats ``mean/var``;
- the frozen DFL projection (reference block.py:65) is skipped — our decode
  folds the softmax-expectation analytically;
- torch bare ``nn.Conv2d`` leaves (e.g. DySample ``offset``) gain the
  ``conv`` level our Conv2d wrapper introduces.

`port_state_dict` works on any model family whose names follow these rules
— golden forward-parity tests cover v8 (detect/seg/pose/obb), v9 (RepConv/
RepNCSPELAN4), v10 (end2end head), v13 and v13-DBL (tests/
test_forward_parity.py). Unmapped keys are reported, never silently dropped.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

# flax names that differ from the merged torch path (exact component match)
_COMPONENT_RENAMES = {
    "edge_proj_0": "edge_proj",  # torch Sequential(Linear, GELU) → plain Dense
    "node_proj_0": "node_proj",
}

# torch keys to skip: recomputed buffers and the analytically-folded DFL
_SKIP_SUFFIXES = (
    "num_batches_tracked",
    "dfl.conv.weight",
    "init_pos",  # DySample static grid, recomputed (DySample.py:43)
    "anchors",
    "anchor_grid",
    "implicit",  # IDetect implicit knobs handled separately below
)


def _merge_path(key: str) -> Tuple[list, str]:
    comps = key.split(".")
    if comps[0] == "model" and len(comps) > 1 and comps[1].isdigit():
        comps = [f"m{comps[1]}"] + comps[2:]
    leaf = comps[-1]
    merged: list = []
    for c in comps[:-1]:
        if c.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{c}"
        else:
            merged.append(c)
    merged = [_COMPONENT_RENAMES.get(c, c) for c in merged]
    return merged, leaf


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def port_state_dict(
    state_dict: Mapping[str, Any],
    variables: Dict[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Return a copy of `variables` with values replaced from a torch
    state_dict of the reference model at matching structure.

    variables: flax {'params': ..., 'batch_stats': ...} as produced by
    DetectionModel.init. strict=True raises on any torch key that cannot be
    placed (other than the known skip list).
    """
    import copy

    import flax

    out = copy.deepcopy(flax.core.unfreeze(variables))
    params = out.get("params", {})
    stats = out.get("batch_stats", {})
    unmapped = []

    for key, val in state_dict.items():
        if any(key.endswith(s) or f".{s}." in key for s in _SKIP_SUFFIXES):
            continue
        merged, leaf = _merge_path(key)
        root = stats if leaf in ("running_mean", "running_var") else params

        def walk(path):
            node = root
            stack = list(path)
            while stack:
                if not isinstance(node, Mapping):
                    return None
                c = stack.pop(0)
                if c in node:
                    node = node[c]
                    continue
                # flat-collapse: torch nests (conv1.conv) where ours flattens
                # into one flax name (RepConv 'conv1_conv')
                if stack and f"{c}_{stack[0]}" in node:
                    node = node[f"{c}_{stack[0]}"]
                    stack.pop(0)
                    continue
                # nested-split: torch flattens (one2one_cv2.0.0 → merged
                # 'one2one_cv2_0_0') where ours nests (one2one/cv2_0_0)
                hit = next((p for p in node if c.startswith(p + "_")), None)
                if hit is not None and isinstance(node[hit], Mapping) \
                        and c[len(hit) + 1:] in node[hit]:
                    node = node[hit][c[len(hit) + 1:]]
                    continue
                return None
            return node

        node = walk(merged)
        if node is None and len(merged) > 1:
            # torch heads inherit Detect, so cv2/cv3 sit directly on the head
            # module; ours composes Detect as a named submodule — 'detect'
            # for Segment/Pose/OBB, 'one2many' for v10Detect (nn/heads.py).
            for sub in ("detect", "one2many"):
                node = walk([merged[0], sub, *merged[1:]])
                if node is not None:
                    break
        ok = node is not None
        if ok and leaf in ("weight", "bias") and isinstance(node, Mapping):
            # bare nn.Conv2d → our Conv2d wrapper adds a 'conv' level
            if "kernel" not in node and "scale" not in node and "bias" not in node and "conv" in node:
                node = node["conv"]
        if not ok or not isinstance(node, Mapping):
            unmapped.append(key)
            continue

        arr = _to_np(val)
        if leaf == "weight":
            if "kernel" in node:
                k = node["kernel"]
                if arr.ndim == 4:
                    arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
                elif arr.ndim == 2:
                    arr = arr.transpose(1, 0)
                target = "kernel"
            elif "scale" in node:  # BatchNorm / GroupNorm gamma
                target = "scale"
            elif "embedding" in node:
                target = "embedding"
            else:
                unmapped.append(key)
                continue
        elif leaf == "bias":
            target = "bias"
        elif leaf == "running_mean":
            target = "mean"
        elif leaf == "running_var":
            target = "var"
        else:  # raw nn.Parameter leaf (gate, prototype_base, ...)
            target = leaf
            if target not in node:
                unmapped.append(key)
                continue
        if target not in node:
            unmapped.append(key)
            continue
        cur = node[target]
        if tuple(cur.shape) != tuple(arr.shape):
            unmapped.append(f"{key} (shape {arr.shape} vs {tuple(cur.shape)})")
            continue
        node[target] = jnp.asarray(arr, dtype=cur.dtype)

    if strict and unmapped:
        raise ValueError(
            f"{len(unmapped)} torch keys could not be ported: {unmapped[:20]}"
        )
    if unmapped:
        # diagnostics via logger — never mutate the variables tree, which is
        # passed straight to model.apply (unknown collections would fail)
        from . import LOGGER

        LOGGER.warning(
            "port_state_dict: %d torch keys not ported: %s%s",
            len(unmapped), unmapped[:10], " …" if len(unmapped) > 10 else "")
    return out


def load_torch_checkpoint(path: str, variables: Dict[str, Any], strict: bool = True):
    """Load a reference-style .pt checkpoint (trainer.py:513 dict or bare
    state_dict) and port its EMA/model weights into flax variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and not any(hasattr(v, "shape") for v in ckpt.values()):
        model = ckpt.get("ema") or ckpt.get("model")
        state = model.float().state_dict() if hasattr(model, "state_dict") else model
    else:
        state = ckpt
    return port_state_dict(state, variables, strict=strict)
