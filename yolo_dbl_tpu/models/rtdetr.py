"""RT-DETR detection family (NHWC, flax.linen).

Reference parity: models/rtdetr/ (385 LoC wrapper) over nn/modules/head.py:537
RTDETRDecoder and nn/modules/transformer.py:218 MSDeformAttn /
DeformableTransformerDecoderLayer. Components:

  * MSDeformAttn — multi-scale deformable attention: per-query sampling
    offsets + softmax attention weights over (levels × points), bilinear
    sampling of the value pyramid (reuses the shared gather sampler);
  * DeformableTransformerDecoderLayer — query self-attention + deformable
    cross-attention + FFN;
  * RTDETRDecoder — per-level input projections, flattened multi-scale
    memory, anchor-based encoder query selection (top-k 300), iterative
    box refinement over 6 decoder layers.

The Hungarian-matching DETR loss is host-side (scipy assignment cannot jit)
and lands with the RT-DETR trainer in a later round; the full inference
path is functional.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention.extra import TorchMHA
from ..ops.resample import sample_bilinear_pixel

Dtype = Any


def _inverse_sigmoid(x, eps: float = 1e-5):
    """Reference nn/modules/utils.py:34 — clamp to [0,1] then eps-guarded logit."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps) / jnp.clip(1.0 - x, eps))


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (reference transformer.py:218)."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, refer_bbox, value_list, train: bool = False):
        """query: (B, Q, C); refer_bbox: (B, Q, 4) normalized cxcywh;
        value_list: per-level NHWC feature maps."""
        b, q, c = query.shape
        nh, nl, npt = self.n_heads, self.n_levels, self.n_points
        hd = c // nh

        offsets = nn.Dense(nh * nl * npt * 2, dtype=self.dtype, name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, nh, nl, npt, 2)
        attn = nn.Dense(nh * nl * npt, dtype=self.dtype, name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(b, q, nh, nl * npt), axis=-1).reshape(b, q, nh, nl, npt)

        centers = refer_bbox[:, :, None, None, None, :2]  # (B, Q, 1, 1, 1, 2)
        wh = refer_bbox[:, :, None, None, None, 2:]
        locs = centers + offsets / npt * wh * 0.5  # normalized xy, reference decoder formula

        out = jnp.zeros((b, q, nh, hd), self.dtype)
        # shared value projection across levels (reference value_proj)
        value_proj = nn.Dense(c, dtype=self.dtype, name="value_proj")
        vs = [value_proj(v) for v in value_list]
        for lvl, v in enumerate(vs):
            vh, vw = v.shape[1:3]
            vheads = v.reshape(b, vh, vw, nh, hd)
            vheads = vheads.transpose(0, 3, 1, 2, 4).reshape(b * nh, vh, vw, hd)
            gx = locs[:, :, :, lvl, :, 0] * vw - 0.5  # (B, Q, nh, npt)
            gy = locs[:, :, :, lvl, :, 1] * vh - 0.5
            gx = gx.transpose(0, 2, 1, 3).reshape(b * nh, q, npt)
            gy = gy.transpose(0, 2, 1, 3).reshape(b * nh, q, npt)
            sampled = sample_bilinear_pixel(vheads, gy, gx, padding_mode="zeros")  # (B*nh, Q, npt, hd)
            w = attn[:, :, :, lvl].transpose(0, 2, 1, 3).reshape(b * nh, q, npt)
            out = out + (sampled * w[..., None]).sum(axis=2).reshape(b, nh, q, hd).transpose(0, 2, 1, 3)
        out = out.reshape(b, q, c)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


class DeformableDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py
    DeformableTransformerDecoderLayer)."""

    d_model: int = 256
    n_heads: int = 8
    n_levels: int = 3
    n_points: int = 4
    d_ffn: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, refer_bbox, value_list, query_pos, train: bool = False):
        q = k = tgt + query_pos
        sa = TorchMHA(self.n_heads, dtype=self.dtype, name="self_attn")(q, k, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + sa)
        ca = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                          dtype=self.dtype, name="cross_attn")(tgt + query_pos, refer_bbox, value_list, train)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + ca)
        f = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        f = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(nn.relu(f))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt + f)


class _MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # children named layers_{i} to mirror the torch MLP's ModuleList
        # (reference head.py MLP: self.layers), so port_state_dict maps
        # `…layers.0.weight` mechanically.
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"layers_{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"layers_{self.layers - 1}")(x)


class RTDETRDecoder(nn.Module):
    """RT-DETR decoder head (reference head.py:537).

    Call with the backbone/neck pyramid [P3, P4, P5]; returns
    (dec_bboxes (B, L, Q, 4) per-layer normalized cxcywh,
     dec_scores (B, L, Q, nc) logits, enc_bboxes, enc_scores).
    """

    nc: int = 80
    ch: Tuple[int, ...] = (256, 512, 1024)
    hd: int = 256
    nq: int = 300
    ndl: int = 6
    nh: int = 8
    ndp: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        b = feats[0].shape[0]
        nl = len(feats)
        # input projections (reference: conv1x1 + BN per level)
        proj = []
        for i, f in enumerate(feats):
            # names mirror the torch Sequential(Conv2d, BN) children (.0/.1)
            y = nn.Conv(self.hd, (1, 1), use_bias=False, dtype=self.dtype, name=f"input_proj_{i}_0")(f)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"input_proj_{i}_1")(y)
            proj.append(y)
        shapes = [p.shape[1:3] for p in proj]
        memory = jnp.concatenate([p.reshape(b, -1, self.hd) for p in proj], axis=1)  # (B, S, C)

        # anchors over all levels (reference _generate_anchors): grid centers +
        # level-scaled wh, logit-space, masked to valid range
        anchors = []
        for lvl, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
            xy = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1).reshape(-1, 2)
            wh = jnp.full((h * w, 2), 0.05 * (2.0**lvl))
            anchors.append(jnp.concatenate([xy, wh], -1))
        anchors = jnp.concatenate(anchors)[None]  # (1, S, 4)
        valid = ((anchors > 0.01) & (anchors < 0.99)).all(-1, keepdims=True)
        anchors_logit = jnp.where(valid, jnp.log(anchors / (1 - anchors)), jnp.inf)
        masked_memory = jnp.where(valid, memory, 0.0)

        # encoder head → top-k query selection (torch Sequential(Linear, LN))
        enc_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="enc_output_1")(
            nn.Dense(self.hd, dtype=self.dtype, name="enc_output_0")(masked_memory)
        )
        enc_scores = nn.Dense(self.nc, dtype=self.dtype, name="enc_score_head")(enc_out)  # (B, S, nc)
        enc_bbox_delta = _MLP(self.hd, 4, dtype=self.dtype, name="enc_bbox_head")(enc_out)
        enc_bboxes_logit = enc_bbox_delta + anchors_logit
        nq = min(self.nq, enc_scores.shape[1])  # tiny inputs: fewer tokens than queries
        topv, topi = jax.lax.top_k(enc_scores.max(-1), nq)  # (B, nq)
        ref_logit = jnp.take_along_axis(enc_bboxes_logit, topi[..., None], axis=1)  # (B, nq, 4)
        ref_bbox = jax.nn.sigmoid(ref_logit)
        enc_sel_scores = jnp.take_along_axis(enc_scores, topi[..., None], axis=1)
        target = jnp.take_along_axis(enc_out, topi[..., None], axis=1)
        target = jax.lax.stop_gradient(target) if train else target

        # decoder with iterative refinement (reference transformer.py
        # DeformableTransformerDecoder.forward)
        dec_bboxes, dec_scores = [], []
        tgt = target
        refer = jax.lax.stop_gradient(ref_bbox) if train else ref_bbox
        # reference: MLP(4, 2*hd, hd, num_layers=2) (head.py:614)
        pos_head = _MLP(2 * self.hd, self.hd, layers=2, dtype=self.dtype, name="query_pos_head")
        # class embedding for contrastive denoising training (head.py:605);
        # created unconditionally so checkpoints carry it.
        _ = nn.Embed(self.nc, self.hd, dtype=self.dtype, name="denoising_class_embed")(
            jnp.zeros((1,), jnp.int32)
        )  # dummy touch so params exist (XLA dead-code-eliminates the lookup)
        last_refined = None
        for i in range(self.ndl):
            pos = pos_head(refer)  # shared head, recomputed from current refs
            tgt = DeformableDecoderLayer(
                self.hd, self.nh, nl, self.ndp, dtype=self.dtype, name=f"decoder_layers_{i}"
            )(tgt, refer, proj, pos, train)
            delta = _MLP(self.hd, 4, dtype=self.dtype, name=f"dec_bbox_head_{i}")(tgt)
            refined = jax.nn.sigmoid(delta + _inverse_sigmoid(refer))
            if train and i > 0:
                # training keeps the grad chain through the previous layer's
                # non-detached box (reference transformer.py:416-419)
                dec_bboxes.append(jax.nn.sigmoid(delta + _inverse_sigmoid(last_refined)))
            else:
                dec_bboxes.append(refined)
            dec_scores.append(nn.Dense(self.nc, dtype=self.dtype, name=f"dec_score_head_{i}")(tgt))
            last_refined = refined
            refer = jax.lax.stop_gradient(refined) if train else refined
        return (
            jnp.stack(dec_bboxes, 1),
            jnp.stack(dec_scores, 1),
            jax.nn.sigmoid(ref_logit),
            enc_sel_scores,
        )


def rtdetr_postprocess(dec_bboxes, dec_scores, img_size: int, conf: float = 0.0, max_det: int = 300):
    """Final-layer outputs → (B, Q, 6) [xyxy, conf, cls] in pixels (reference
    models/rtdetr/predict.py: sigmoid scores, no NMS needed)."""
    from ..ops.boxes import xywh2xyxy

    boxes = xywh2xyxy(dec_bboxes[:, -1]) * img_size
    scores = jax.nn.sigmoid(dec_scores[:, -1])
    best = scores.max(-1)
    cls = scores.argmax(-1).astype(jnp.float32)
    order = jnp.argsort(-best, axis=-1)
    boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    best = jnp.take_along_axis(best, order, axis=1)
    cls = jnp.take_along_axis(cls, order, axis=1)
    dets = jnp.concatenate([boxes, best[..., None], cls[..., None]], -1)
    return dets[:, :max_det]
