"""Host-side image augmentations (numpy / cv2).

Equivalent of the reference's data/augment.py pipeline (v8_transforms at
augment.py:2278): Mosaic (490), RandomPerspective (952), MixUp (867),
RandomHSV, RandomFlip, LetterBox (1477). These run on the host CPU exactly
like the reference's (cv2-based); the TPU path receives fixed-shape float
batches. Keeping the geometry host-side avoids dynamic shapes under jit;
the normalize/scale step is fused on-device.

All functions take/return HWC uint8 RGB images and label dicts:
    {"boxes": (N, 4) float32 xyxy in pixels, "cls": (N,) int32}
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np


def letterbox(
    img: np.ndarray,
    new_shape: Tuple[int, int] = (640, 640),
    color: int = 114,
    scaleup: bool = True,
    center: bool = True,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Aspect-preserving resize + pad (reference augment.py:1477 LetterBox).

    Returns (image, gain, (pad_w, pad_h)).
    """
    shape = img.shape[:2]  # h, w
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (round(shape[1] * r), round(shape[0] * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if center:
        dw /= 2
        dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = round(dh - 0.1), round(dh + 0.1)
    left, right = round(dw - 0.1), round(dw + 0.1)
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(color,) * 3)
    return img, r, (left, top)


def apply_letterbox_to_boxes(boxes: np.ndarray, gain: float, pad: Tuple[float, float]) -> np.ndarray:
    out = boxes.copy()
    out[:, [0, 2]] = out[:, [0, 2]] * gain + pad[0]
    out[:, [1, 3]] = out[:, [1, 3]] * gain + pad[1]
    return out


def random_hsv(img: np.ndarray, rng: np.random.Generator, hgain=0.015, sgain=0.7, vgain=0.4) -> np.ndarray:
    """HSV jitter via LUTs (reference augment.py RandomHSV)."""
    if hgain == 0 and sgain == 0 and vgain == 0:
        return img
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(img.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
    return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2RGB)


def random_flip(img: np.ndarray, labels: Dict, rng: np.random.Generator, fliplr=0.5, flipud=0.0):
    h, w = img.shape[:2]
    boxes = labels["boxes"]
    if flipud and rng.random() < flipud:
        img = np.flipud(img)
        boxes = boxes.copy()
        boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
    if fliplr and rng.random() < fliplr:
        img = np.fliplr(img)
        boxes = boxes.copy()
        boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    return np.ascontiguousarray(img), {**labels, "boxes": boxes}


def random_perspective(
    img: np.ndarray,
    labels: Dict,
    rng: np.random.Generator,
    degrees=0.0,
    translate=0.1,
    scale=0.5,
    shear=0.0,
    perspective=0.0,
    border: Tuple[int, int] = (0, 0),
):
    """Affine/perspective warp with box transform + candidate filtering
    (reference augment.py:952 RandomPerspective)."""
    h = img.shape[0] + border[0] * 2
    w = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * h

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(w, h), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(w, h), borderValue=(114, 114, 114))

    boxes = labels["boxes"]
    n = len(boxes)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)  # corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack((x.min(1), y.min(1), x.max(1), y.max(1)), axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
        keep = _box_candidates(boxes.T * s, new.T)
        boxes = new[keep]
        labels = {**labels, "boxes": boxes.astype(np.float32), "cls": labels["cls"][keep]}
    return img, labels


def _box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter warped boxes (reference augment.py box_candidates)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def mosaic4(
    items: List[Tuple[np.ndarray, Dict]],
    imgsz: int,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, Dict]:
    """2×2 mosaic on a 2× canvas (reference augment.py:490 Mosaic._mosaic4)."""
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    all_boxes, all_cls = [], []
    for i, (img, labels) in enumerate(items[:4]):
        h, w = img.shape[:2]
        if i == 0:  # top left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(labels["boxes"]):
            b = labels["boxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            all_boxes.append(b)
            all_cls.append(labels["cls"])
    boxes = np.concatenate(all_boxes, 0) if all_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(all_cls, 0) if all_cls else np.zeros((0,), np.int32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
    return canvas, {"boxes": boxes.astype(np.float32), "cls": cls}


def mixup(img1, labels1, img2, labels2, rng: np.random.Generator):
    """Beta(32, 32) image blend (reference augment.py:867 MixUp)."""
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r + img2.astype(np.float32) * (1 - r)).astype(np.uint8)
    labels = {
        "boxes": np.concatenate([labels1["boxes"], labels2["boxes"]], 0),
        "cls": np.concatenate([labels1["cls"], labels2["cls"]], 0),
    }
    return img, labels


class TrainTransforms:
    """Composed train-time pipeline (reference augment.py:2278 v8_transforms):
    Mosaic → RandomPerspective → MixUp → HSV → flips, then normalized-xywh
    label formatting. Albumentations-style blur/CLAHE extras are omitted
    (p≈0.01 in the reference)."""

    def __init__(self, imgsz=640, hyp=None):
        hyp = hyp or {}
        self.imgsz = imgsz
        self.mosaic = hyp.get("mosaic", 1.0)
        self.mixup = hyp.get("mixup", 0.0)
        self.degrees = hyp.get("degrees", 0.0)
        self.translate = hyp.get("translate", 0.1)
        self.scale = hyp.get("scale", 0.5)
        self.shear = hyp.get("shear", 0.0)
        self.perspective = hyp.get("perspective", 0.0)
        self.hsv_h = hyp.get("hsv_h", 0.015)
        self.hsv_s = hyp.get("hsv_s", 0.7)
        self.hsv_v = hyp.get("hsv_v", 0.4)
        self.fliplr = hyp.get("fliplr", 0.5)
        self.flipud = hyp.get("flipud", 0.0)
        self.mosaic_enabled = True

    def close_mosaic(self):
        self.mosaic_enabled = False

    def __call__(self, dataset, index, rng: np.random.Generator):
        use_mosaic = self.mosaic_enabled and self.mosaic > 0 and rng.random() < self.mosaic
        if use_mosaic:
            idxs = [index] + list(rng.integers(0, len(dataset), 3))
            items = [dataset.load_resized(i, self.imgsz) for i in idxs]
            img, labels = mosaic4(items, self.imgsz, rng)
            border = (-self.imgsz // 2, -self.imgsz // 2)
        else:
            img, labels = dataset.load_resized(index, self.imgsz)
            img, gain, pad = letterbox(img, (self.imgsz, self.imgsz))
            labels = {**labels, "boxes": apply_letterbox_to_boxes(labels["boxes"], gain, pad)}
            border = (0, 0)
        img, labels = random_perspective(
            img, labels, rng,
            degrees=self.degrees, translate=self.translate, scale=self.scale,
            shear=self.shear, perspective=self.perspective, border=border,
        )
        if use_mosaic and self.mixup > 0 and rng.random() < self.mixup:
            j = int(rng.integers(0, len(dataset)))
            items2 = [dataset.load_resized(i, self.imgsz) for i in [j] + list(rng.integers(0, len(dataset), 3))]
            img2, labels2 = mosaic4(items2, self.imgsz, rng)
            img2, labels2 = random_perspective(
                img2, labels2, rng,
                degrees=self.degrees, translate=self.translate, scale=self.scale,
                shear=self.shear, perspective=self.perspective, border=(-self.imgsz // 2, -self.imgsz // 2),
            )
            img, labels = mixup(img, labels, img2, labels2, rng)
        img = random_hsv(img, rng, self.hsv_h, self.hsv_s, self.hsv_v)
        img, labels = random_flip(img, labels, rng, fliplr=self.fliplr, flipud=self.flipud)
        return img, labels


class ValTransforms:
    """Letterbox-only eval path (reference dataset.py build_transforms, augment off)."""

    def __init__(self, imgsz=640):
        self.imgsz = imgsz

    def __call__(self, dataset, index, rng=None):
        img, labels = dataset.load_resized(index, self.imgsz)
        h_pre, w_pre = img.shape[:2]
        img, gain, pad = letterbox(img, (self.imgsz, self.imgsz), scaleup=False)
        labels = {**labels, "boxes": apply_letterbox_to_boxes(labels["boxes"], gain, pad),
                  "ratio_pad": (gain, pad)}
        # task side channels follow the same affine
        if "segments" in labels:
            labels["segments"] = [p * gain + np.asarray(pad, np.float32) for p in labels["segments"]]
        if "keypoints" in labels and len(labels["keypoints"]):
            kp = labels["keypoints"].copy()
            kp[..., 0] = kp[..., 0] * gain + pad[0]
            kp[..., 1] = kp[..., 1] * gain + pad[1]
            labels["keypoints"] = kp
        if "rboxes" in labels and len(labels["rboxes"]):
            rb = labels["rboxes"].copy()  # normalized xywhr on the source img
            rb[:, 0] = (rb[:, 0] * w_pre * gain + pad[0]) / self.imgsz
            rb[:, 1] = (rb[:, 1] * h_pre * gain + pad[1]) / self.imgsz
            rb[:, 2] = rb[:, 2] * w_pre * gain / self.imgsz
            rb[:, 3] = rb[:, 3] * h_pre * gain / self.imgsz
            labels["rboxes"] = rb
        return img, labels
