"""SAM2 — Segment Anything 2 (NHWC, flax).

Reference parity: models/sam/modules/{encoders.py Hiera:645 / FpnNeck:501 /
ImageEncoder:465 / MemoryEncoder:378, blocks.py MultiScaleBlock:583 /
MultiScaleAttention:503 / RoPEAttention:405 / MaskDownSampler:54 /
CXBlock:114 / Fuser:208 / PositionEmbeddingSine:698,
memory_attention.py MemoryAttention/MemoryAttentionLayer} and the
image-level prompting flow of sam.py:105 SAM2Model.

Covered: the full SAM2 image pipeline (Hiera trunk → FPN neck → prompt +
mask decoding via the SAM decoder) and the video-memory machinery
(MemoryEncoder producing mask-conditioned memories, MemoryAttention
conditioning current-frame features on a memory bank) as composable
modules + a functional `track_step`. The full stateful video predictor
(object pointers bank management, occlusion heuristics) is thin Python on
top and lives upstream in predict.py; here `track_step` shows the jittable
core. Weights are upstream downloads (N/A zero-egress).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .sam import LayerNorm2d, PromptEncoder

Dtype = Any


# --------------------------------------------------------------------------
# Hiera trunk
# --------------------------------------------------------------------------
def _do_pool(x, stride: int):
    """MaxPool(k=s=stride) on NHWC (blocks.py do_pool)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, stride, stride, 1), (1, stride, stride, 1), "VALID")


def _win_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def _win_unpartition(wins, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    c = wins.shape[-1]
    b = wins.shape[0] // ((hp // ws) * (wp // ws))
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, c)[:, :h, :w]


class MultiScaleAttention(nn.Module):
    """Attention with optional query pooling (blocks.py:503)."""

    dim_out: int
    num_heads: int
    q_stride: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        nh = self.num_heads
        hd = self.dim_out // nh
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_stride:
            q = _do_pool(q.reshape(b, h, w, -1), self.q_stride)
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, nh, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q * hd**-0.5, k), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed attention + optional q-pool stage change
    (blocks.py:583)."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: int = 0
    window_size: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(y)
        if self.q_stride:
            shortcut = _do_pool(shortcut, self.q_stride)
        hh, ww = x.shape[1:3]
        ws = self.window_size
        if ws > 0:
            y, pad_hw = _win_partition(y, ws)
        y = MultiScaleAttention(self.dim_out, self.num_heads,
                                self.q_stride, dtype=self.dtype, name="attn")(y)
        if self.q_stride:
            ws = ws // self.q_stride if ws > 0 else 0
            hh, ww = shortcut.shape[1:3]
            pad_hw = (hh + (ws - hh % ws) % ws, ww + (ws - ww % ws) % ws) if ws else None
        if self.window_size > 0:
            y = _win_unpartition(y, ws, pad_hw, (hh, ww))
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(nn.gelu(z))
        return x + z


class Hiera(nn.Module):
    """Hierarchical trunk (encoders.py:645): 7×7/s4 patch embed, windowed
    background + window positional embeddings, staged MultiScaleBlocks with
    q-pooling; returns per-stage feature maps (high→low resolution)."""

    embed_dim: int = 96
    num_heads: int = 1
    q_pool: int = 3
    q_stride: int = 2
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        depth = sum(self.stages)
        stage_ends = [sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]

        x = nn.Conv(self.embed_dim, (7, 7), strides=(4, 4), padding=3,
                    dtype=self.dtype, name="patch_embed")(x)
        h, w = x.shape[1:3]
        bkg = self.param("pos_embed", nn.initializers.zeros,
                         (1, *self.window_pos_embed_bkg_spatial_size, self.embed_dim))
        win = self.param("pos_embed_window", nn.initializers.zeros,
                         (1, self.window_spec[0], self.window_spec[0], self.embed_dim))
        pos = jax.image.resize(bkg, (1, h, w, self.embed_dim), "bicubic")
        pos = pos + jnp.tile(win, (1, h // win.shape[1], w // win.shape[2], 1))
        x = x + pos

        dim, heads, cur_stage = self.embed_dim, self.num_heads, 1
        outs = []
        for i in range(depth):
            ws = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                ws = 0
            dim_out = dim
            if i - 1 in stage_ends:
                dim_out = int(dim * self.dim_mul)
                heads = int(heads * self.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim, dim_out, heads,
                q_stride=self.q_stride if i in q_pool_blocks else 0,
                window_size=ws, dtype=self.dtype, name=f"block{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outs.append(x)
        return outs  # high→low resolution


def sine_pos_embed(h, w, num_pos_feats=256, temperature=10000.0):
    """DETR-style normalized sine embedding, NHWC (blocks.py:698)."""
    npf = num_pos_feats // 2
    scale = 2 * math.pi
    ys = (jnp.arange(h, dtype=jnp.float32) + 1) / (h + 1e-6) * scale
    xs = (jnp.arange(w, dtype=jnp.float32) + 1) / (w + 1e-6) * scale
    dim_t = temperature ** (2 * (jnp.arange(npf) // 2) / npf)
    py = ys[:, None] / dim_t  # (h, npf)
    px = xs[:, None] / dim_t
    py = jnp.stack([jnp.sin(py[:, 0::2]), jnp.cos(py[:, 1::2])], -1).reshape(h, -1)
    px = jnp.stack([jnp.sin(px[:, 0::2]), jnp.cos(px[:, 1::2])], -1).reshape(w, -1)
    pos = jnp.concatenate([
        jnp.broadcast_to(py[:, None], (h, w, npf)),
        jnp.broadcast_to(px[None, :], (h, w, npf))], -1)
    return pos[None]  # (1, h, w, num_pos_feats)


class FpnNeck(nn.Module):
    """FPN variant without output convs (encoders.py:501)."""

    d_model: int = 256
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        """xs: low→high channel order? — torch passes trunk outputs reversed
        so that convs[0] matches the HIGHEST channel count; we take trunk
        outputs (high-res first) and walk top-down like the reference."""
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):  # low resolution → high
            lat = nn.Conv(self.d_model, (1, 1), dtype=self.dtype, name=f"conv{n - i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                b, hh, wwid, c = prev.shape
                td = jax.image.resize(prev.astype(jnp.float32),
                                      (b, hh * 2, wwid * 2, c), "nearest")
                prev = lat + td.astype(lat.dtype)
            else:
                prev = lat
            out[i] = prev
            pos[i] = sine_pos_embed(prev.shape[1], prev.shape[2], self.d_model)
        return out, pos


class ImageEncoder(nn.Module):
    """Trunk + neck (encoders.py:465); scalp drops the lowest-res level."""

    trunk: nn.Module
    neck: nn.Module
    scalp: int = 1

    def __call__(self, x):
        feats, pos = self.neck(self.trunk(x))
        if self.scalp > 0:
            feats, pos = feats[: -self.scalp], pos[: -self.scalp]
        return {"vision_features": feats[-1], "vision_pos_enc": pos,
                "backbone_fpn": feats}


# --------------------------------------------------------------------------
# Rotary memory attention
# --------------------------------------------------------------------------
def _axial_rope_angles(end_x: int, end_y: int, dim: int, theta=10000.0):
    """(N, dim/2) rotation angles: x-axial for the first half of the pairs,
    y-axial for the second (utils.py:82 compute_axial_cis)."""
    f = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4] / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    tx, ty = t % end_x, np.floor(t / end_x)
    return jnp.asarray(np.concatenate([np.outer(tx, f), np.outer(ty, f)], -1),
                       jnp.float32)  # (N, dim/2)


def _apply_rope(x, angles):
    """Rotate channel pairs of (B, H, N, hd) by (N, hd/2) angles."""
    b, h, n, hd = x.shape
    xr = x.reshape(b, h, n, hd // 2, 2)
    cos = jnp.cos(angles)[None, None]
    sin = jnp.sin(angles)[None, None]
    x0, x1 = xr[..., 0], xr[..., 1]
    return jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], -1).reshape(b, h, n, hd)


class RoPEAttention(nn.Module):
    """Attention with axial rotary embeddings (blocks.py:405)."""

    embedding_dim: int
    num_heads: int = 1
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    rope_k_repeat: bool = False
    rope_theta: float = 10000.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0):
        d = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        hd = d // nh
        qp = nn.Dense(d, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(d, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(d, dtype=self.dtype, name="v_proj")(v)
        b, nq, _ = qp.shape
        nk = kp.shape[1]
        qh = qp.reshape(b, nq, nh, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(b, nk, nh, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(b, nk, nh, hd).transpose(0, 2, 1, 3)

        side = int(math.sqrt(nq))
        angles = _axial_rope_angles(side, side, hd, self.rope_theta)  # (nq, hd/2)
        qh = _apply_rope(qh, angles)
        n_rope = nk - num_k_exclude_rope
        if n_rope == nq:
            k_ang = angles
        else:
            assert self.rope_k_repeat and n_rope % nq == 0
            k_ang = jnp.tile(angles, (n_rope // nq, 1))
        kh = jnp.concatenate([
            _apply_rope(kh[:, :, :n_rope], k_ang), kh[:, :, n_rope:]], axis=2)

        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", qh * hd**-0.5, kh), -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    """Self-attn + cross-attn-to-memory + FFN (memory_attention.py:6)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None, num_k_exclude_rope: int = 0):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        qk = y + query_pos if (self.pos_enc_at_attn and query_pos is not None) else y
        tgt = tgt + RoPEAttention(self.d_model, 1, dtype=self.dtype,
                                  name="self_attn")(qk, qk, y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
        qq = y + query_pos if (self.pos_enc_at_cross_attn_queries and query_pos is not None) else y
        kk = memory + pos if (self.pos_enc_at_cross_attn_keys and pos is not None) else memory
        tgt = tgt + RoPEAttention(self.d_model, 1, kv_in_dim=64, rope_k_repeat=True,
                                  dtype=self.dtype, name="cross_attn_image")(
            qq, kk, memory, num_k_exclude_rope=num_k_exclude_rope)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(y))
        return tgt + y


class MemoryAttention(nn.Module):
    """Stack of memory attention layers (memory_attention.py:120)."""

    d_model: int = 256
    num_layers: int = 4
    pos_enc_at_input: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, curr, memory, curr_pos=None, memory_pos=None,
                 num_obj_ptr_tokens: int = 0):
        x = curr
        if self.pos_enc_at_input and curr_pos is not None:
            x = x + 0.1 * curr_pos
        for i in range(self.num_layers):
            x = MemoryAttentionLayer(self.d_model, dtype=self.dtype, name=f"layer{i}")(
                x, memory, pos=memory_pos, query_pos=curr_pos,
                num_k_exclude_rope=num_obj_ptr_tokens)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


# --------------------------------------------------------------------------
# Memory encoder
# --------------------------------------------------------------------------
class MaskDownSampler(nn.Module):
    """Stride-16 mask embedding (blocks.py:54)."""

    embed_dim: int = 256
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    total_stride: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        cin = 1
        for i in range(num_layers):
            cout = cin * self.stride ** 2
            x = nn.Conv(cout, (self.kernel_size,) * 2, strides=(self.stride,) * 2,
                        padding=self.padding, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.gelu(LayerNorm2d(dtype=self.dtype, name=f"ln{i}")(x))
            cin = cout
        return nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="proj")(x)


class CXBlock(nn.Module):
    """ConvNeXt block with layer scale (blocks.py:114)."""

    dim: int
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        y = nn.Conv(self.dim, (self.kernel_size,) * 2, padding=self.kernel_size // 2,
                    feature_group_count=self.dim, dtype=self.dtype, name="dwconv")(x)
        y = LayerNorm2d(dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(nn.gelu(y))
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return r + gamma * y


class MemoryEncoder(nn.Module):
    """Fuse pixel features with a predicted mask into a compact memory
    (encoders.py:378)."""

    out_dim: int = 64
    in_dim: int = 256
    num_fuser_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, masks, skip_mask_sigmoid: bool = False):
        """pix_feat (B, H, W, in_dim); masks (B, 16H, 16W, 1) logits."""
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        m = MaskDownSampler(self.in_dim, dtype=self.dtype, name="mask_downsampler")(masks)
        x = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype, name="pix_feat_proj")(pix_feat)
        x = x + m
        for i in range(self.num_fuser_layers):
            x = CXBlock(self.in_dim, dtype=self.dtype, name=f"fuser{i}")(x)
        if self.out_dim != self.in_dim:
            x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="out_proj")(x)
        pos = sine_pos_embed(x.shape[1], x.shape[2], self.out_dim)
        return x, pos


# --------------------------------------------------------------------------
# SAM2 mask decoder (decoders.py:176 SAM2MaskDecoder): SAM1's decoder plus
# an object-score token/head, high-res skip features from the FPN's
# stride-4/8 levels (conv_s0/s1), sigmoid IoU head, and optional dynamic
# single-mask fallback via stability scores.
# --------------------------------------------------------------------------
class SAM2MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden: int = 256
    dynamic_multimask_via_stability: bool = True
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = True,
                 high_res_features: Optional[Sequence[jnp.ndarray]] = None,
                 training: bool = False):
        """image_embeddings (B, g, g, C); high_res_features, when given, are
        the RAW stride-4/8 FPN maps [(B, 4g, 4g, C), (B, 2g, 2g, C)] — the
        reference applies decoder-owned conv_s0/s1 in forward_image
        (sam.py:1013); owning the convs, we apply them here (same params,
        same math). Returns (masks, iou, sam_tokens_out, object_score_logits)
        per reference decoders.py:314 forward."""
        from .sam import TwoWayTransformer

        c = self.transformer_dim
        nm = self.num_multimask_outputs + 1
        tn = nn.initializers.normal(1.0)
        obj_token = self.param("obj_score_token", tn, (1, c))
        iou_token = self.param("iou_token", tn, (1, c))
        mask_tokens = self.param("mask_tokens", tn, (nm, c))
        b = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([obj_token, iou_token, mask_tokens], 0)[None], (b, 2 + nm, c))
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt
        hs, keys = TwoWayTransformer(dtype=self.dtype, name="transformer")(
            src, image_pe[None], tokens)
        iou_tok = hs[:, 1]
        mask_toks = hs[:, 2:2 + nm]

        g = src.shape[1]
        up = keys.reshape(b, g, g, c)
        up = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="upscale_conv1")(up)
        if high_res_features is not None:
            feat_s0 = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="conv_s0")(high_res_features[0])
            feat_s1 = nn.Conv(c // 4, (1, 1), dtype=self.dtype, name="conv_s1")(high_res_features[1])
            up = up + feat_s1
        up = nn.gelu(LayerNorm2d(dtype=self.dtype, name="upscale_ln")(up))
        up = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="upscale_conv2")(up)
        if high_res_features is not None:
            up = up + feat_s0
        up = nn.gelu(up)  # (B, 4g, 4g, C/8)

        hyper = []
        for i in range(nm):
            t = mask_toks[:, i]
            for j in range(2):
                t = nn.relu(nn.Dense(c, dtype=self.dtype, name=f"hyper{i}_fc{j}")(t))
            hyper.append(nn.Dense(c // 8, dtype=self.dtype, name=f"hyper{i}_fc2")(t))
        hyper = jnp.stack(hyper, axis=1)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)  # (B, nm, 4g, 4g)

        t = iou_tok
        for j in range(self.iou_head_depth - 1):
            t = nn.relu(nn.Dense(self.iou_head_hidden, dtype=self.dtype, name=f"iou_fc{j}")(t))
        iou_pred = jax.nn.sigmoid(  # iou_prediction_use_sigmoid=True in _build_sam2
            nn.Dense(nm, dtype=self.dtype, name="iou_out")(t))

        t = hs[:, 0]
        for j in range(2):
            t = nn.relu(nn.Dense(c, dtype=self.dtype, name=f"pobj_fc{j}")(t))
        object_score_logits = nn.Dense(1, dtype=self.dtype, name="pobj_fc2")(t)

        if multimask_output:
            out_masks, out_iou = masks[:, 1:], iou_pred[:, 1:]
            sam_tokens_out = mask_toks[:, 1:]  # use_multimask_token_for_obj_ptr=True
        elif self.dynamic_multimask_via_stability and not training:
            out_masks, out_iou = self._dynamic_single(masks, iou_pred)
            sam_tokens_out = mask_toks[:, 0:1]
        else:
            out_masks, out_iou = masks[:, 0:1], iou_pred[:, 0:1]
            sam_tokens_out = mask_toks[:, 0:1]
        return out_masks, out_iou, sam_tokens_out, object_score_logits

    def _dynamic_single(self, all_masks, all_iou):
        """Fallback to the best multimask output when the single-mask token is
        unstable (reference decoders.py:471)."""
        flat = all_masks.reshape(*all_masks.shape[:2], -1)
        area_i = (flat > self.stability_delta).sum(-1).astype(jnp.float32)
        area_u = (flat > -self.stability_delta).sum(-1).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)

        best = jnp.argmax(all_iou[:, 1:], axis=-1) + 1  # best multimask token
        b = all_masks.shape[0]
        bi = jnp.arange(b)
        multi_masks = all_masks[bi, best][:, None]
        multi_iou = all_iou[bi, best][:, None]
        stable = (stability[:, 0] >= self.stability_thresh)[:, None]
        out_masks = jnp.where(stable[..., None, None], all_masks[:, 0:1], multi_masks)
        out_iou = jnp.where(stable, all_iou[:, 0:1], multi_iou)
        return out_masks, out_iou


# --------------------------------------------------------------------------
# SAM2 model (image prompting + memory conditioning)
# --------------------------------------------------------------------------
class SAM2Model(nn.Module):
    """SAM2 image pipeline + video-memory components (sam.py:105, image
    path). `__call__` = promptable image segmentation; `encode_memory` /
    `condition_on_memory` expose the video machinery."""

    embed_dim: int = 96
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    num_heads: int = 1
    global_att_blocks: Tuple[int, ...] = (5, 7, 9)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    window_spatial_size: Tuple[int, int] = (7, 7)  # pos_embed bkg grid (build.py: 14 only for sam2-b)
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    image_size: int = 1024
    mem_dim: int = 64
    dtype: Dtype = jnp.float32

    def setup(self):
        trunk = Hiera(embed_dim=self.embed_dim, num_heads=self.num_heads,
                      stages=self.stages, global_att_blocks=self.global_att_blocks,
                      window_spec=self.window_spec,
                      window_pos_embed_bkg_spatial_size=self.window_spatial_size,
                      dtype=self.dtype)
        neck = FpnNeck(d_model=256,
                       backbone_channel_list=self.backbone_channel_list,
                       dtype=self.dtype)
        self.image_encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=1)
        g = self.image_size // 16
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=g, input_image_size=self.image_size, dtype=self.dtype)
        self.mask_decoder = SAM2MaskDecoder(dtype=self.dtype)
        self.memory_attention = MemoryAttention(dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(out_dim=self.mem_dim, dtype=self.dtype)
        # video-tracking params (reference sam.py:252-312, _build_sam2 flags:
        # directly_add_no_mem_embed, use_obj_ptrs_in_encoder, fixed_no_obj_ptr,
        # use_mlp_for_obj_ptr_proj, num_maskmem=7, mem_dim=64)
        tn = nn.initializers.normal(0.02)
        hd = 256
        self.no_mem_embed = self.param("no_mem_embed", tn, (1, 1, hd))
        self.no_mem_pos_enc = self.param("no_mem_pos_enc", tn, (1, 1, hd))
        self.maskmem_tpos_enc = self.param("maskmem_tpos_enc", tn, (7, 1, 1, self.mem_dim))
        self.no_obj_ptr = self.param("no_obj_ptr", tn, (1, hd))
        self.obj_ptr_proj = [nn.Dense(hd, dtype=self.dtype, name=f"optr_fc{j}") for j in range(3)]
        # downsamples prompt masks fed alongside object pointers (sam.py:252)
        self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4), dtype=self.dtype,
                                       name="mask_downsample")

    def project_obj_ptr(self, sam_output_token, object_score_logits):
        """SAM output token → object pointer with occlusion handling
        (reference sam.py:528-537: fixed_no_obj_ptr, hard lambda)."""
        t = sam_output_token
        for j, fc in enumerate(self.obj_ptr_proj):
            t = fc(t)
            if j < 2:
                t = nn.relu(t)
        lam = (object_score_logits > 0).astype(t.dtype)  # (B, 1) hard choice
        return lam * t + (1.0 - lam) * self.no_obj_ptr

    def encode_image(self, x):
        return self.image_encoder(x)

    def __call__(self, image, points=None, labels=None, boxes=None,
                 multimask_output: bool = True):
        enc = self.image_encoder(image)
        # image prompting adds no_mem_embed to the stride-16 level
        # (reference predict.py:806 get_im_features, directly_add_no_mem_embed)
        src = enc["vision_features"] + self.no_mem_embed[0]  # (B, g, g, 256)
        if self.is_initializing():
            # materialize the video-memory params (flax creates setup
            # submodule params lazily on first call)
            b, g = src.shape[0], src.shape[1]
            mem, mpos = self.memory_encoder(
                src, jnp.zeros((b, 16 * g, 16 * g, 1), src.dtype))
            self.memory_attention(
                src.reshape(b, -1, src.shape[-1]), mem.reshape(b, -1, self.mem_dim),
                curr_pos=enc["vision_pos_enc"][-1].reshape(1, -1, src.shape[-1]),
                memory_pos=mpos.reshape(1, -1, self.mem_dim))
            self.mask_downsample(jnp.zeros((1, 16, 16, 1), src.dtype))
            self.project_obj_ptr(jnp.zeros((1, 256), src.dtype),
                                 jnp.zeros((1, 1), src.dtype))
        sparse, dense = self.prompt_encoder(points, labels, boxes, batch=image.shape[0])
        return self.mask_decoder(src, self.prompt_encoder.dense_pe(), sparse, dense,
                                 multimask_output,
                                 high_res_features=enc["backbone_fpn"][:2])

    def encode_memory(self, vision_features, mask_logits):
        """Current-frame features + predicted mask → memory (B, g, g, 64)."""
        return self.memory_encoder(vision_features, mask_logits)

    def condition_on_memory(self, vision_features, vision_pos, memories, memory_pos,
                            num_obj_ptr_tokens: int = 0):
        """Condition frame tokens on a concatenated memory bank.

        vision_features (B, g, g, 256); memories (B, T·g·g [+ptr], 64) with
        matching memory_pos; the trailing num_obj_ptr_tokens are object
        pointers excluded from RoPE (reference memory_attention.py
        num_k_exclude_rope). Returns conditioned features (B, g, g, 256).
        """
        b, h, w, c = vision_features.shape
        curr = vision_features.reshape(b, h * w, c)
        cpos = jnp.broadcast_to(vision_pos.reshape(1, h * w, c), (b, h * w, c))
        out = self.memory_attention(curr, memories, curr_pos=cpos, memory_pos=memory_pos,
                                    num_obj_ptr_tokens=num_obj_ptr_tokens)
        return out.reshape(b, h, w, c)

    def decode_masks(self, src, points=None, labels=None, boxes=None,
                     multimask_output: bool = True, high_res_features=None):
        """Prompt-encode + mask-decode on (possibly memory-conditioned)
        stride-16 features — the video path's per-frame decode (reference
        sam.py _forward_sam_heads). Returns (masks, iou, sam_tokens_out,
        object_score_logits)."""
        sparse, dense = self.prompt_encoder(points, labels, boxes, batch=src.shape[0])
        return self.mask_decoder(src, self.prompt_encoder.dense_pe(), sparse,
                                 dense, multimask_output,
                                 high_res_features=high_res_features)


def build_sam2(size: str = "t", image_size: int = 1024, dtype=jnp.float32) -> SAM2Model:
    """SAM2 tiny/small/base+/large configs (reference sam/build.py:68-130)."""
    cfgs = {
        "t": dict(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                  global_att_blocks=(5, 7, 9), window_spec=(8, 4, 14, 7),
                  backbone_channel_list=(768, 384, 192, 96)),
        "s": dict(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                  global_att_blocks=(7, 10, 13), window_spec=(8, 4, 14, 7),
                  backbone_channel_list=(768, 384, 192, 96)),
        "b": dict(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
                  global_att_blocks=(12, 16, 20), window_spec=(8, 4, 14, 7),
                  window_spatial_size=(14, 14),
                  backbone_channel_list=(896, 448, 224, 112)),
        "l": dict(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
                  global_att_blocks=(23, 33, 43), window_spec=(8, 4, 16, 8),
                  backbone_channel_list=(1152, 576, 288, 144)),
    }
    return SAM2Model(image_size=image_size, dtype=dtype, **cfgs[size])
