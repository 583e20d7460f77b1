"""Detection head and decode (NHWC, flax.linen).

TPU-native equivalent of the reference's anchor-free decoupled Detect head
(nn/modules/head.py:21) and DFL integral decode (nn/modules/block.py:65).
The module emits raw per-level maps; `decode_detections` is a pure function
that folds anchors (static shapes), DFL softmax-expectation and dist2bbox
into the jitted graph — the reference's `Detect._inference` (head.py:143).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.anchors import dist2bbox, make_anchors
from .common import Conv, Conv2d, DWConv

Dtype = Any


class Detect(nn.Module):
    """YOLO detect head (reference head.py:21, legacy=False DWConv cls branch).

    Returns a list of raw (B, H, W, 4*reg_max + nc) maps, one per level.
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    legacy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(xs):
            box = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            box = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(box, train)
            box = Conv2d(4 * self.reg_max, 1, dtype=self.dtype, name=f"cv2_{i}_2")(box)
            if self.legacy:
                cls = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
                cls = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(cls, train)
                cls = Conv2d(self.nc, 1, dtype=self.dtype, name=f"cv3_{i}_2")(cls)
            else:
                c1 = x.shape[-1]
                cls = DWConv(c1, 3, dtype=self.dtype, name=f"cv3_{i}_0_0")(x, train)
                cls = Conv(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(cls, train)
                cls = DWConv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1_0")(cls, train)
                cls = Conv(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(cls, train)
                cls = Conv2d(self.nc, 1, dtype=self.dtype, name=f"cv3_{i}_2")(cls)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs


def dfl_expectation(box_logits, reg_max=16):
    """Distribution Focal Loss integral: E[softmax(bins)] per side.

    Args:
        box_logits: (..., A, 4*reg_max).
    Returns:
        (..., A, 4) expected distances.
    """
    shape = box_logits.shape
    x = box_logits.reshape(*shape[:-1], 4, reg_max)
    proj = jnp.arange(reg_max, dtype=x.dtype)
    return (jax.nn.softmax(x, axis=-1) * proj).sum(-1)


def flatten_levels(feats):
    """Flatten per-level NHWC maps to (B, A, C) tokens, concatenated over levels."""
    b = feats[0].shape[0]
    return jnp.concatenate([f.reshape(b, -1, f.shape[-1]) for f in feats], axis=1)


def decode_detections(feats, strides, nc, reg_max=16):
    """Decode raw Detect maps to (B, 4+nc, A) xywh+scores in input-pixel units.

    Mirrors reference Detect._inference (head.py:143): make_anchors at cell
    offset 0.5, DFL expectation, dist2bbox (xywh), scale by stride, sigmoid
    class scores.
    """
    shapes = [f.shape[1:3] for f in feats]
    anchors, stride_t = make_anchors(shapes, strides)  # (A,2), (A,1)
    x = flatten_levels(feats)  # (B, A, 4*reg_max + nc)
    box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    dist = dfl_expectation(box_logits, reg_max)  # (B, A, 4)
    dbox = dist2bbox(dist, anchors[None].astype(dist.dtype), xywh=True) * stride_t[None].astype(dist.dtype)
    scores = jax.nn.sigmoid(cls_logits)
    return jnp.concatenate([dbox, scores], axis=-1).swapaxes(-1, -2)  # (B, 4+nc, A)
