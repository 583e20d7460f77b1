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


class V10Detect(nn.Module):
    """NMS-free v10 head (reference head.py v10Detect): the lightweight
    DWConv cls branch (== Detect legacy=False) duplicated into one2many
    (training aux, TAL top-10) and one2one (deployment, TAL top-1) branches;
    one2one consumes detached features.

    Returns {'one2many': [...], 'one2one': [...]} raw map lists.
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    max_det: int = 300
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        one2many = Detect(self.nc, tuple(self.ch), self.reg_max, False, dtype=self.dtype, name="one2many")(xs, train)
        detached = [jax.lax.stop_gradient(x) for x in xs]
        one2one = Detect(self.nc, tuple(self.ch), self.reg_max, False, dtype=self.dtype, name="one2one")(detached, train)
        return {"one2many": one2many, "one2one": one2one}


def v10_postprocess(pred, max_det=300, nc=80):
    """NMS-free top-k selection (reference head.py Detect.postprocess):
    pred (B, 4+nc, A) decoded one2one output → (B, max_det, 6)."""
    pred = jnp.swapaxes(pred, -1, -2)  # (B, A, 4+nc)
    boxes, scores = pred[..., :4], pred[..., 4:]
    best = scores.max(axis=-1)
    k = min(max_det, best.shape[-1])
    top, idx = jax.lax.top_k(best, k)
    b = pred.shape[0]
    sel_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    sel_scores = jnp.take_along_axis(scores, idx[..., None].repeat(scores.shape[-1], -1), axis=1)
    flat_scores = sel_scores.reshape(b, -1)
    top2, idx2 = jax.lax.top_k(flat_scores, k)
    anchor_idx = idx2 // scores.shape[-1]
    cls_idx = (idx2 % scores.shape[-1]).astype(jnp.float32)
    final_boxes = jnp.take_along_axis(sel_boxes, anchor_idx[..., None], axis=1)
    from ..ops.boxes import xywh2xyxy

    return jnp.concatenate(
        [xywh2xyxy(final_boxes), top2[..., None], cls_idx[..., None]], axis=-1
    )


class Proto(nn.Module):
    """Mask prototype head (reference nn/modules/block.py Proto): conv →
    2x upsample (transposed conv) → conv → 1×1 to nm prototypes."""

    c_: int = 256
    c2: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        y = nn.ConvTranspose(self.c_, (2, 2), strides=(2, 2), dtype=self.dtype, name="upsample")(y)
        y = Conv(self.c_, 3, dtype=self.dtype, name="cv2")(y, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(y, train)


class Segment(nn.Module):
    """Segmentation head (reference head.py Segment): Detect + per-level mask
    coefficients + shared prototypes. Returns (detect_maps, coeffs, protos)."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    legacy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = Detect(self.nc, tuple(self.ch), self.reg_max, self.legacy, dtype=self.dtype, name="detect")(xs, train)
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, self.nm)
        coeffs = []
        for i, x in enumerate(xs):
            y = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            coeffs.append(Conv2d(self.nm, 1, dtype=self.dtype, name=f"cv4_{i}_2")(y))
        return det, coeffs, protos


class Pose(nn.Module):
    """Keypoint head (reference head.py Pose): Detect + per-level keypoint
    regression (nk = kpt_shape[0] * kpt_shape[1])."""

    nc: int = 80
    kpt_shape: Tuple[int, int] = (17, 3)
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    legacy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = Detect(self.nc, tuple(self.ch), self.reg_max, self.legacy, dtype=self.dtype, name="detect")(xs, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpts = []
        for i, x in enumerate(xs):
            y = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            kpts.append(Conv2d(nk, 1, dtype=self.dtype, name=f"cv4_{i}_2")(y))
        return det, kpts


class OBB(nn.Module):
    """Oriented-box head (reference head.py OBB): Detect + per-level angle."""

    nc: int = 80
    ne: int = 1
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    legacy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = Detect(self.nc, tuple(self.ch), self.reg_max, self.legacy, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.ne)
        angles = []
        for i, x in enumerate(xs):
            y = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            a = Conv2d(self.ne, 1, dtype=self.dtype, name=f"cv4_{i}_2")(y)
            angles.append((jax.nn.sigmoid(a) - 0.25) * jnp.pi)  # reference angle range
        return det, angles


class Classify(nn.Module):
    """Classification head (reference head.py Classify): conv 1280 → GAP →
    dropout → linear."""

    c2: int  # number of classes
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        y = Conv(1280, 1, 1, dtype=self.dtype, name="conv")(x, train)
        y = y.mean(axis=(1, 2))
        y = nn.Dropout(0.0, deterministic=not train)(y)
        return nn.Dense(self.c2, dtype=self.dtype, name="linear")(y)


def decode_masks(coeffs_flat, protos, boxes_xyxy, img_hw):
    """Combine mask coefficients with prototypes and crop to boxes
    (reference utils/ops.py process_mask): sigmoid(coeff · protos), zeroed
    outside each box. coeffs_flat (N, nm); protos (Hm, Wm, nm);
    boxes in input-image pixels."""
    hm, wm = protos.shape[:2]
    masks = jax.nn.sigmoid(jnp.einsum("nk,hwk->nhw", coeffs_flat, protos))
    sx, sy = wm / img_hw[1], hm / img_hw[0]
    x1 = boxes_xyxy[:, 0:1] * sx
    y1 = boxes_xyxy[:, 1:2] * sy
    x2 = boxes_xyxy[:, 2:3] * sx
    y2 = boxes_xyxy[:, 3:4] * sy
    cols = jnp.arange(wm)[None, None, :]
    rows = jnp.arange(hm)[None, :, None]
    inside = (cols >= x1[..., None]) & (cols < x2[..., None]) & (rows >= y1[..., None]) & (rows < y2[..., None])
    return masks * inside


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


class IDetect(nn.Module):
    """YOLOv7 anchor-based head with implicit knowledge layers
    (cfg/models/v7/yolov7.yaml tail; the torch reference ships the v7 yaml
    display-only without this head — implemented here so v7 runs). Per
    level: y = (conv(x + implicit_a)) * implicit_m, reshaped to
    (B, H, W, na, 5+nc). ImplicitA inits N(0, .02), ImplicitM N(1, .02).
    """

    nc: int
    anchors: tuple  # nl tuples of 2*na flat (w, h) pairs, in pixels
    ch: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        na = len(self.anchors[0]) // 2
        no = self.nc + 5
        outs = []
        for i, x in enumerate(feats):
            ia = self.param(f"ia{i}", nn.initializers.normal(0.02), (1, 1, 1, self.ch[i]))
            im = self.param(
                f"im{i}",
                lambda k, s: 1.0 + jax.random.normal(k, s) * 0.02,
                (1, 1, 1, na * no),
            )
            y = nn.Conv(na * no, (1, 1), dtype=self.dtype, name=f"m{i}")(x + ia) * im
            b, h, w, _ = y.shape
            outs.append(y.reshape(b, h, w, na, no))
        return outs


def decode_v7(feats, strides, anchors, nc):
    """Decode IDetect maps to (B, 4+nc, A): xy = (2σ-0.5+grid)·stride,
    wh = (2σ)²·anchor, score = σ(obj)·σ(cls) (yolov7 IDetect inference)."""
    b = feats[0].shape[0]
    rows = []
    for x, s, anc in zip(feats, strides, anchors):
        _, h, w, na, no = x.shape
        sig = jax.nn.sigmoid(x.astype(jnp.float32))
        gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32))
        grid = jnp.stack([gx, gy], -1)[None, :, :, None, :]  # (1,H,W,1,2)
        awh = jnp.asarray(anc, jnp.float32).reshape(na, 2)[None, None, None]
        xy = (sig[..., :2] * 2.0 - 0.5 + grid) * s
        wh = (sig[..., 2:4] * 2.0) ** 2 * awh
        score = sig[..., 5:] * sig[..., 4:5]
        rows.append(jnp.concatenate([xy, wh, score], -1).reshape(b, -1, 4 + nc))
    return jnp.concatenate(rows, axis=1).swapaxes(-1, -2)  # (B, 4+nc, A)


def decode_obb(feats, angle_maps, strides, nc, reg_max=16):
    """Decode OBB head maps to (B, 4+nc+1, A): rotated xywh in pixels, class
    scores, angle last (reference head.py OBB.forward inference concat)."""
    from ..ops.anchors import dist2rbox

    shapes = [f.shape[1:3] for f in feats]
    anchors, stride_t = make_anchors(shapes, strides)
    x = flatten_levels(feats)
    angle = flatten_levels(angle_maps)  # head already maps to [-pi/4, 3pi/4]
    box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max:]
    dist = dfl_expectation(box_logits, reg_max)
    rbox = dist2rbox(dist, angle, anchors[None].astype(dist.dtype)) * stride_t[None].astype(dist.dtype)
    scores = jax.nn.sigmoid(cls_logits)
    return jnp.concatenate([rbox, scores, angle], axis=-1).swapaxes(-1, -2)


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
