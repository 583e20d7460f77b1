"""Torch SAM checkpoint → our flax SAM variables.

The reference vendors Meta's SAM (models/sam/modules/{encoders,transformer,
decoders}.py) and loads its published .pt checkpoints. Our SAM
(models/sam.py) is at exact param parity but uses flat flax names, so the
generic utils/port.py walk cannot place the keys; this module carries the
explicit rename table. `port_sam_state_dict` accepts a raw torch state_dict
(e.g. `torch.load("sam_b.pt")` or the reference model's .state_dict()) and
returns updated variables, letting reference users bring their SAM weights
across unchanged.

Layout notes:
- torch convs are OIHW → flax HWIO; ConvTranspose2d is (I, O, kH, kW) →
  flax (kH, kW, I, O) (lax.conv_transpose, no kernel flip at stride==kernel);
- SAM's ViT pos_embed is already channels-last (1, H, W, C) upstream;
- `prompt_encoder.pe_layer.positional_encoding_gaussian_matrix` is a
  registered BUFFER upstream (not a parameter) — we mirror it in a
  "buffers" collection so param counts stay at exact parity;
- the four point embeddings are separate nn.Embedding(1, C) upstream and
  one (4, C) param here; rows stack in order [neg, pos, box-tl, box-br].
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..utils.port import _to_np

# (regex on the torch key minus its leaf, replacement path template)
# \g<N> refer to regex groups; path components are '/'-separated.
_RULES = [
    (r"^image_encoder\.patch_embed\.proj$", r"image_encoder/patch_embed"),
    (r"^image_encoder\.blocks\.(\d+)\.attn\.(qkv|proj)$", r"image_encoder/block\1/attn/\2"),
    (r"^image_encoder\.blocks\.(\d+)\.attn$", r"image_encoder/block\1/attn"),
    (r"^image_encoder\.blocks\.(\d+)\.norm(\d)$", r"image_encoder/block\1/norm\2"),
    (r"^image_encoder\.blocks\.(\d+)\.mlp\.lin(\d)$", r"image_encoder/block\1/mlp_lin\2"),
    (r"^image_encoder\.neck\.0$", r"image_encoder/neck_conv1"),
    (r"^image_encoder\.neck\.1$", r"image_encoder/neck_ln1"),
    (r"^image_encoder\.neck\.2$", r"image_encoder/neck_conv2"),
    (r"^image_encoder\.neck\.3$", r"image_encoder/neck_ln2"),
    (r"^image_encoder$", r"image_encoder"),  # pos_embed raw leaf
    (r"^prompt_encoder\.mask_downscaling\.0$", r"prompt_encoder/mask_conv1"),
    (r"^prompt_encoder\.mask_downscaling\.1$", r"prompt_encoder/mask_ln1"),
    (r"^prompt_encoder\.mask_downscaling\.3$", r"prompt_encoder/mask_conv2"),
    (r"^prompt_encoder\.mask_downscaling\.4$", r"prompt_encoder/mask_ln2"),
    (r"^prompt_encoder\.mask_downscaling\.6$", r"prompt_encoder/mask_conv3"),
    (r"^prompt_encoder\.(no_mask_embed|not_a_point_embed)$", r"prompt_encoder/\1"),
    (r"^mask_decoder\.transformer\.layers\.(\d+)\.self_attn\.(\w+)$",
     r"mask_decoder/transformer/l\1_self/\2"),
    (r"^mask_decoder\.transformer\.layers\.(\d+)\.cross_attn_token_to_image\.(\w+)$",
     r"mask_decoder/transformer/l\1_t2i/\2"),
    (r"^mask_decoder\.transformer\.layers\.(\d+)\.cross_attn_image_to_token\.(\w+)$",
     r"mask_decoder/transformer/l\1_i2t/\2"),
    (r"^mask_decoder\.transformer\.layers\.(\d+)\.norm(\d)$",
     r"mask_decoder/transformer/l\1_norm\2"),
    (r"^mask_decoder\.transformer\.layers\.(\d+)\.mlp\.lin(\d)$",
     r"mask_decoder/transformer/l\1_mlp\2"),
    (r"^mask_decoder\.transformer\.final_attn_token_to_image\.(\w+)$",
     r"mask_decoder/transformer/final_t2i/\1"),
    (r"^mask_decoder\.transformer\.norm_final_attn$",
     r"mask_decoder/transformer/final_norm"),
    (r"^mask_decoder\.output_upscaling\.0$", r"mask_decoder/upscale_conv1"),
    (r"^mask_decoder\.output_upscaling\.1$", r"mask_decoder/upscale_ln"),
    (r"^mask_decoder\.output_upscaling\.3$", r"mask_decoder/upscale_conv2"),
    (r"^mask_decoder\.output_hypernetworks_mlps\.(\d+)\.layers\.(\d+)$",
     r"mask_decoder/hyper\1_fc\2"),
    (r"^mask_decoder\.iou_prediction_head\.layers\.([01])$", r"mask_decoder/iou_fc\1"),
    (r"^mask_decoder\.iou_prediction_head\.layers\.2$", r"mask_decoder/iou_out"),
    (r"^mask_decoder$", r"mask_decoder"),  # iou_token / mask_tokens handled below
]

_CONVT = ("mask_decoder/upscale_conv1", "mask_decoder/upscale_conv2")


def _node(tree: Dict[str, Any], path):
    for c in path:
        tree = tree[c]
    return tree


# MobileSAM TinyViT encoder (reference models/sam/modules/tiny_encoder.py),
# keys relative to the encoder root (strip any "image_encoder." prefix first).
_TINYVIT_RULES = [
    (r"^patch_embed\.seq\.0\.(c|bn)$", r"patch_embed/c1/\1"),
    (r"^patch_embed\.seq\.2\.(c|bn)$", r"patch_embed/c2/\1"),
    (r"^layers\.0\.blocks\.(\d+)\.(conv\d)\.(c|bn)$", r"l0_b\1/\2/\3"),
    (r"^layers\.(\d)\.downsample\.(conv\d)\.(c|bn)$", r"l\1_ds/\2/\3"),
    (r"^layers\.([123])\.blocks\.(\d+)\.attn\.(norm|qkv|proj)$", r"l\1_b\2/attn/\3"),
    (r"^layers\.([123])\.blocks\.(\d+)\.attn$", r"l\1_b\2/attn"),  # attention_biases
    (r"^layers\.([123])\.blocks\.(\d+)\.local_conv\.(c|bn)$", r"l\1_b\2/local_conv/\3"),
    (r"^layers\.([123])\.blocks\.(\d+)\.mlp\.(norm|fc1|fc2)$", r"l\1_b\2/mlp_\3"),
    (r"^neck\.0$", r"neck_conv1"),
    (r"^neck\.1$", r"neck_ln1"),
    (r"^neck\.2$", r"neck_conv2"),
    (r"^neck\.3$", r"neck_ln2"),
    (r"^norm_head$", r"norm_head"),
    (r"^head$", r"head"),
]


# SAM2 (reference models/sam/modules/{encoders,blocks,memory_attention,
# decoders,sam}.py; built by build.py _build_sam2). Keys relative to the
# SAM2Model root.
_SAM2_RULES = [
    # Hiera trunk
    (r"^image_encoder\.trunk\.patch_embed\.proj$", r"image_encoder/trunk/patch_embed"),
    (r"^image_encoder\.trunk\.blocks\.(\d+)\.(norm\d|proj)$", r"image_encoder/trunk/block\1/\2"),
    (r"^image_encoder\.trunk\.blocks\.(\d+)\.attn\.(qkv|proj)$", r"image_encoder/trunk/block\1/attn/\2"),
    (r"^image_encoder\.trunk\.blocks\.(\d+)\.mlp\.layers\.([01])$",
     lambda m: f"image_encoder/trunk/block{m.group(1)}/mlp_fc{int(m.group(2)) + 1}"),
    # FPN neck: convs[i] ordered lowest-resolution-first on both sides
    (r"^image_encoder\.neck\.convs\.(\d+)\.conv$", r"image_encoder/neck/conv\1"),
    # memory attention
    (r"^memory_attention\.layers\.(\d+)\.(self_attn|cross_attn_image)\.(\w+)$",
     r"memory_attention/layer\1/\2/\3"),
    (r"^memory_attention\.layers\.(\d+)\.(norm\d|linear\d)$", r"memory_attention/layer\1/\2"),
    (r"^memory_attention\.norm$", r"memory_attention/norm"),
    # memory encoder
    (r"^memory_encoder\.mask_downsampler\.encoder\.(\d+)$",
     lambda m: ("memory_encoder/mask_downsampler/proj" if m.group(1) == "12"
                else f"memory_encoder/mask_downsampler/"
                     f"{'conv' if int(m.group(1)) % 3 == 0 else 'ln'}{int(m.group(1)) // 3}")),
    (r"^memory_encoder\.fuser\.layers\.(\d+)\.(dwconv|norm|pwconv1|pwconv2)$",
     r"memory_encoder/fuser\1/\2"),
    (r"^memory_encoder\.(pix_feat_proj|out_proj)$", r"memory_encoder/\1"),
    # prompt encoder (same structure as SAM1)
    (r"^sam_prompt_encoder\.mask_downscaling\.0$", r"prompt_encoder/mask_conv1"),
    (r"^sam_prompt_encoder\.mask_downscaling\.1$", r"prompt_encoder/mask_ln1"),
    (r"^sam_prompt_encoder\.mask_downscaling\.3$", r"prompt_encoder/mask_conv2"),
    (r"^sam_prompt_encoder\.mask_downscaling\.4$", r"prompt_encoder/mask_ln2"),
    (r"^sam_prompt_encoder\.mask_downscaling\.6$", r"prompt_encoder/mask_conv3"),
    # mask decoder
    (r"^sam_mask_decoder\.transformer\.layers\.(\d+)\.self_attn\.(\w+)$",
     r"mask_decoder/transformer/l\1_self/\2"),
    (r"^sam_mask_decoder\.transformer\.layers\.(\d+)\.cross_attn_token_to_image\.(\w+)$",
     r"mask_decoder/transformer/l\1_t2i/\2"),
    (r"^sam_mask_decoder\.transformer\.layers\.(\d+)\.cross_attn_image_to_token\.(\w+)$",
     r"mask_decoder/transformer/l\1_i2t/\2"),
    (r"^sam_mask_decoder\.transformer\.layers\.(\d+)\.norm(\d)$",
     r"mask_decoder/transformer/l\1_norm\2"),
    (r"^sam_mask_decoder\.transformer\.layers\.(\d+)\.mlp\.layers\.([01])$",
     lambda m: f"mask_decoder/transformer/l{m.group(1)}_mlp{int(m.group(2)) + 1}"),
    (r"^sam_mask_decoder\.transformer\.final_attn_token_to_image\.(\w+)$",
     r"mask_decoder/transformer/final_t2i/\1"),
    (r"^sam_mask_decoder\.transformer\.norm_final_attn$", r"mask_decoder/transformer/final_norm"),
    (r"^sam_mask_decoder\.output_upscaling\.0$", r"mask_decoder/upscale_conv1"),
    (r"^sam_mask_decoder\.output_upscaling\.1$", r"mask_decoder/upscale_ln"),
    (r"^sam_mask_decoder\.output_upscaling\.3$", r"mask_decoder/upscale_conv2"),
    (r"^sam_mask_decoder\.(conv_s0|conv_s1)$", r"mask_decoder/\1"),
    (r"^sam_mask_decoder\.output_hypernetworks_mlps\.(\d+)\.layers\.(\d+)$",
     r"mask_decoder/hyper\1_fc\2"),
    (r"^sam_mask_decoder\.iou_prediction_head\.layers\.([01])$", r"mask_decoder/iou_fc\1"),
    (r"^sam_mask_decoder\.iou_prediction_head\.layers\.2$", r"mask_decoder/iou_out"),
    (r"^sam_mask_decoder\.pred_obj_score_head\.layers\.(\d+)$", r"mask_decoder/pobj_fc\1"),
    # top-level video params / modules
    (r"^obj_ptr_proj\.layers\.(\d+)$", r"optr_fc\1"),
    (r"^mask_downsample$", r"mask_downsample"),
]

_SAM2_CONVT = ("mask_decoder/upscale_conv1", "mask_decoder/upscale_conv2")
_SAM2_RAW = {"maskmem_tpos_enc", "no_mem_embed", "no_mem_pos_enc", "no_obj_ptr"}


def port_sam2_state_dict(state_dict: Mapping[str, Any], variables: Dict[str, Any],
                         strict: bool = True) -> Dict[str, Any]:
    """Place a torch SAM2 state_dict (build.py _build_sam2 / sam2{,.1}_*.pt)
    into our SAM2Model variables tree."""
    import copy

    import flax

    out = copy.deepcopy(flax.core.unfreeze(variables))
    params = out["params"]
    unmapped = []
    point_rows = {}

    for key, val in state_dict.items():
        arr = _to_np(val)
        if key.endswith("num_batches_tracked"):
            continue
        if key in _SAM2_RAW:
            cur = params[key]
            if arr.ndim == 4 and key == "maskmem_tpos_enc":
                pass  # torch (7,1,1,64) already matches
            if tuple(arr.shape) != tuple(cur.shape):
                unmapped.append(f"{key} (shape {arr.shape} vs {tuple(cur.shape)})")
                continue
            params[key] = jnp.asarray(arr, cur.dtype)
            continue
        if key == "image_encoder.trunk.pos_embed":
            cur = params["image_encoder"]["trunk"]["pos_embed"]
            arr = arr.transpose(0, 2, 3, 1)  # NCHW → NHWC
            if tuple(arr.shape) != tuple(cur.shape):
                unmapped.append(f"{key} (shape {arr.shape} vs {tuple(cur.shape)})")
                continue
            params["image_encoder"]["trunk"]["pos_embed"] = jnp.asarray(arr, cur.dtype)
            continue
        if key == "image_encoder.trunk.pos_embed_window":
            cur = params["image_encoder"]["trunk"]["pos_embed_window"]
            arr = arr.transpose(0, 2, 3, 1)
            params["image_encoder"]["trunk"]["pos_embed_window"] = jnp.asarray(arr, cur.dtype)
            continue
        if key == "sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            out.setdefault("buffers", {}).setdefault("prompt_encoder", {})[
                "pe_gaussian"] = jnp.asarray(arr, jnp.float32)
            continue
        m = re.match(r"^sam_prompt_encoder\.point_embeddings\.(\d+)\.weight$", key)
        if m:
            point_rows[int(m.group(1))] = arr[0]
            continue
        m = re.match(r"^sam_prompt_encoder\.(no_mask_embed|not_a_point_embed)\.weight$", key)
        if m:
            params["prompt_encoder"][m.group(1)] = jnp.asarray(arr)
            continue
        m = re.match(r"^sam_mask_decoder\.(obj_score_token|iou_token|mask_tokens)\.weight$", key)
        if m:
            params["mask_decoder"][m.group(1)] = jnp.asarray(arr)
            continue
        m = re.match(r"^memory_encoder\.fuser\.layers\.(\d+)\.gamma$", key)
        if m:
            params["memory_encoder"][f"fuser{m.group(1)}"]["gamma"] = jnp.asarray(arr)
            continue

        stem, leaf = key.rsplit(".", 1)
        path = None
        for pat, repl in _SAM2_RULES:
            m = re.match(pat, stem)
            if m:
                path = (repl(m) if callable(repl) else m.expand(repl)).split("/")
                break
        if path is None:
            unmapped.append(key)
            continue
        root = (out.get("batch_stats", {})
                if leaf in ("running_mean", "running_var") else params)
        try:
            node = _node(root, path)
        except KeyError:
            unmapped.append(key)
            continue
        if not isinstance(node, Mapping):
            unmapped.append(key)
            continue
        joined = "/".join(path)
        if leaf == "weight":
            if "kernel" in node:
                if arr.ndim == 4:
                    if joined in _SAM2_CONVT:
                        arr = arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()  # flip (see above)
                    else:
                        arr = arr.transpose(2, 3, 1, 0)
                elif arr.ndim == 2:
                    arr = arr.transpose(1, 0)
                target = "kernel"
            elif "scale" in node:
                target = "scale"
            elif "weight" in node:
                target = "weight"
            else:
                unmapped.append(key)
                continue
        else:
            target = {"running_mean": "mean", "running_var": "var"}.get(leaf, leaf)
        if target not in node:
            unmapped.append(key)
            continue
        cur = node[target]
        if tuple(cur.shape) != tuple(arr.shape):
            unmapped.append(f"{key} (shape {arr.shape} vs {tuple(cur.shape)})")
            continue
        node[target] = jnp.asarray(arr, dtype=cur.dtype)

    if point_rows:
        stacked = np.stack([point_rows[i] for i in sorted(point_rows)])
        params["prompt_encoder"]["point_embeddings"] = jnp.asarray(
            stacked, params["prompt_encoder"]["point_embeddings"].dtype)

    if strict and unmapped:
        raise ValueError(f"{len(unmapped)} SAM2 keys could not be ported: {unmapped[:20]}")
    if unmapped:
        from ..utils.settings import LOGGER

        LOGGER.warning("port_sam2_state_dict: %d keys not ported: %s", len(unmapped), unmapped[:10])
    return out


def port_tinyvit_state_dict(state_dict: Mapping[str, Any], variables: Dict[str, Any],
                            strict: bool = True) -> Dict[str, Any]:
    """Place a torch TinyViT (MobileSAM encoder) state_dict into our TinyViT
    variables. Accepts either a standalone encoder dict or a full MobileSAM
    dict (keys prefixed ``image_encoder.``; other components ignored —
    port them with `port_sam_state_dict` against the SAM wrapper)."""
    import copy

    import flax

    out = copy.deepcopy(flax.core.unfreeze(variables))
    params = out["params"]
    stats = out.get("batch_stats", {})
    unmapped = []

    for key, val in state_dict.items():
        if key.startswith(("prompt_encoder.", "mask_decoder.")):
            continue
        k = key[len("image_encoder."):] if key.startswith("image_encoder.") else key
        if k.endswith(("num_batches_tracked", "attention_bias_idxs")):
            continue  # recomputed buffers
        stem, leaf = k.rsplit(".", 1)
        path = None
        for pat, repl in _TINYVIT_RULES:
            m = re.match(pat, stem)
            if m:
                path = m.expand(repl).split("/")
                break
        if path is None:
            unmapped.append(key)
            continue
        root = stats if leaf in ("running_mean", "running_var") else params
        try:
            node = _node(root, path)
        except KeyError:
            unmapped.append(key)
            continue
        arr = _to_np(val)
        if leaf == "weight":
            if "kernel" in node:
                if arr.ndim == 4:
                    arr = arr.transpose(2, 3, 1, 0)
                elif arr.ndim == 2:
                    arr = arr.transpose(1, 0)
                target = "kernel"
            elif "scale" in node:
                target = "scale"
            elif "weight" in node:  # LayerNorm2d torch-leaf naming
                target = "weight"
            else:
                unmapped.append(key)
                continue
        elif leaf == "running_mean":
            target = "mean"
        elif leaf == "running_var":
            target = "var"
        else:
            target = leaf
        if not isinstance(node, Mapping) or target not in node:
            unmapped.append(key)
            continue
        cur = node[target]
        if tuple(cur.shape) != tuple(arr.shape):
            unmapped.append(f"{key} (shape {arr.shape} vs {tuple(cur.shape)})")
            continue
        node[target] = jnp.asarray(arr, dtype=cur.dtype)

    if strict and unmapped:
        raise ValueError(f"{len(unmapped)} TinyViT keys could not be ported: {unmapped[:20]}")
    if unmapped:
        from ..utils.settings import LOGGER

        LOGGER.warning("port_tinyvit_state_dict: %d keys not ported: %s",
                       len(unmapped), unmapped[:10])
    return out


def port_sam_state_dict(state_dict: Mapping[str, Any], variables: Dict[str, Any],
                        strict: bool = True) -> Dict[str, Any]:
    """Place a torch SAM state_dict into our SAM variables tree."""
    import copy

    import flax

    out = copy.deepcopy(flax.core.unfreeze(variables))
    params = out["params"]
    unmapped = []
    point_rows = {}

    for key, val in state_dict.items():
        arr = _to_np(val)
        if key == "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            out.setdefault("buffers", {}).setdefault("prompt_encoder", {})[
                "pe_gaussian"] = jnp.asarray(arr, jnp.float32)
            continue
        m = re.match(r"^prompt_encoder\.point_embeddings\.(\d+)\.weight$", key)
        if m:
            point_rows[int(m.group(1))] = arr[0]
            continue
        m = re.match(r"^prompt_encoder\.(no_mask_embed|not_a_point_embed)\.weight$", key)
        if m:
            params["prompt_encoder"][m.group(1)] = jnp.asarray(arr)
            continue
        if key == "mask_decoder.iou_token.weight":
            params["mask_decoder"]["iou_token"] = jnp.asarray(arr)
            continue
        if key == "mask_decoder.mask_tokens.weight":
            params["mask_decoder"]["mask_tokens"] = jnp.asarray(arr)
            continue

        stem, leaf = key.rsplit(".", 1)
        path = None
        for pat, repl in _RULES:
            m = re.match(pat, stem)
            if m:
                path = m.expand(repl).split("/")
                break
        if path is None:
            unmapped.append(key)
            continue
        try:
            node = _node(params, path)
        except KeyError:
            unmapped.append(key)
            continue
        if not isinstance(node, Mapping):
            unmapped.append(key)
            continue

        joined = "/".join(path)
        if leaf == "weight":
            if "kernel" in node:
                if arr.ndim == 4:
                    if joined in _CONVT:
                        # torch ConvTranspose2d (I,O,kh,kw) → flax (kh,kw,I,O)
                        # with a spatial FLIP: lax.conv_transpose mirrors the
                        # kernel relative to torch's adjoint-of-conv (verified
                        # empirically, 0.0 err flipped vs 0.89 unflipped)
                        arr = arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
                    else:
                        arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
                elif arr.ndim == 2:
                    arr = arr.transpose(1, 0)
                target = "kernel"
            elif "scale" in node:
                target = "scale"
            elif "weight" in node:  # LayerNorm2d keeps the torch leaf name
                target = "weight"
            else:
                unmapped.append(key)
                continue
        elif leaf in ("bias", "rel_pos_h", "rel_pos_w", "pos_embed"):
            target = leaf
        else:
            target = leaf
        if target not in node:
            unmapped.append(key)
            continue
        cur = node[target]
        if tuple(cur.shape) != tuple(arr.shape):
            unmapped.append(f"{key} (shape {arr.shape} vs {tuple(cur.shape)})")
            continue
        node[target] = jnp.asarray(arr, dtype=cur.dtype)

    if point_rows:
        stacked = np.stack([point_rows[i] for i in sorted(point_rows)])
        cur = params["prompt_encoder"]["point_embeddings"]
        if stacked.shape == tuple(cur.shape):
            params["prompt_encoder"]["point_embeddings"] = jnp.asarray(stacked, cur.dtype)
        else:
            unmapped.append(f"point_embeddings (shape {stacked.shape} vs {tuple(cur.shape)})")

    if strict and unmapped:
        raise ValueError(f"{len(unmapped)} SAM keys could not be ported: {unmapped[:20]}")
    if unmapped:
        from ..utils.settings import LOGGER

        LOGGER.warning("port_sam_state_dict: %d keys not ported: %s", len(unmapped), unmapped[:10])
    return out
