"""Prediction engine + Results containers.

Equivalent of the reference's BasePredictor.stream_inference
(engine/predictor.py:64,220) and the Results family (engine/results.py:187
Results, :938 Boxes, :1107 Masks, :1251 Keypoints, :1356 Probs, :1462 OBB):
letterbox preprocess on host, jitted forward + decode + NMS on device, box
rescale to original resolution, typed per-task containers with
plot/json/txt/crop/verbose surfaces.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import letterbox
from ..nn.tasks import DetectionModel
from ..ops.nms import non_max_suppression, non_max_suppression_rotated


@dataclass
class Boxes:
    """Detection box container (reference results.py:938).

    data is (n, 6) [x1, y1, x2, y2, conf, cls] or (n, 7) with a track id
    column inserted before conf: [x1, y1, x2, y2, id, conf, cls].
    """

    data: np.ndarray

    @property
    def is_track(self):
        return self.data.shape[-1] == 7

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def id(self):
        return self.data[:, 4] if self.is_track else None

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.stack(
            [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1
        )

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Boxes(self.data[idx].reshape(-1, self.data.shape[-1]))


@dataclass
class Masks:
    """Instance masks at original image resolution (reference results.py:1107)."""

    data: np.ndarray  # (n, H, W) bool

    @property
    def xy(self) -> List[np.ndarray]:
        """Per-instance polygon(s) in pixels (largest external contour)."""
        import cv2

        out = []
        for m in self.data.astype(np.uint8):
            contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if contours:
                c = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
            else:
                c = np.zeros((0, 2), np.float32)
            out.append(c)
        return out

    @property
    def xyn(self) -> List[np.ndarray]:
        h, w = self.data.shape[1:]
        return [p / np.array([w, h], np.float32) for p in self.xy]

    def __len__(self):
        return len(self.data)


@dataclass
class Keypoints:
    """Pose keypoints in original-image pixels (reference results.py:1251)."""

    data: np.ndarray  # (n, K, 3) x, y, conf

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def conf(self):
        return self.data[..., 2]

    def __len__(self):
        return len(self.data)


@dataclass
class Probs:
    """Classification probabilities (reference results.py:1356)."""

    data: np.ndarray  # (nc,)

    @property
    def top1(self) -> int:
        return int(self.data.argmax())

    @property
    def top5(self) -> List[int]:
        return self.data.argsort()[::-1][:5].tolist()

    @property
    def top1conf(self) -> float:
        return float(self.data.max())

    @property
    def top5conf(self):
        return np.sort(self.data)[::-1][:5]


@dataclass
class OBB:
    """Rotated boxes (reference results.py:1462). data (n, 7)
    [cx, cy, w, h, angle(rad), conf, cls] in original-image pixels."""

    data: np.ndarray

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self):
        """(n, 4, 2) corner points."""
        cx, cy, w, h, a = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(a), np.sin(a)
        dx1, dy1 = (w / 2) * cos, (w / 2) * sin
        dx2, dy2 = -(h / 2) * sin, (h / 2) * cos
        c = np.stack([cx, cy], -1)[:, None]
        d1 = np.stack([dx1, dy1], -1)[:, None]
        d2 = np.stack([dx2, dy2], -1)[:, None]
        return np.concatenate([c + d1 + d2, c - d1 + d2, c - d1 - d2, c + d1 - d2], axis=1)

    @property
    def xyxy(self):
        """Axis-aligned envelope of the rotated box."""
        pts = self.xyxyxyxy
        return np.concatenate([pts.min(1), pts.max(1)], axis=1)

    def __len__(self):
        return len(self.data)


@dataclass
class Results:
    """Per-image inference result (reference results.py:187)."""

    boxes: Optional[Boxes]
    orig_shape: tuple
    path: Optional[str] = None
    names: Dict[int, str] = field(default_factory=dict)
    masks: Optional[Masks] = None
    keypoints: Optional[Keypoints] = None
    probs: Optional[Probs] = None
    obb: Optional[OBB] = None
    orig_img: Optional[np.ndarray] = None

    def __len__(self):
        for attr in (self.boxes, self.obb, self.masks, self.keypoints):
            if attr is not None:
                return len(attr)
        return 0

    def to_json_dicts(self) -> List[Dict]:
        if self.probs is not None:
            return [{"name": self.names.get(self.probs.top1, str(self.probs.top1)),
                     "class": self.probs.top1, "confidence": self.probs.top1conf}]
        out = []
        if self.obb is not None:
            for i, row in enumerate(self.obb.data):
                out.append({
                    "name": self.names.get(int(row[6]), str(int(row[6]))),
                    "class": int(row[6]), "confidence": float(row[5]),
                    "box": {"x": float(row[0]), "y": float(row[1]), "w": float(row[2]),
                            "h": float(row[3]), "angle": float(row[4])},
                })
            return out
        for i, row in enumerate(self.boxes.data):
            rec = {
                "name": self.names.get(int(row[-1]), str(int(row[-1]))),
                "class": int(row[-1]),
                "confidence": float(row[-2]),
                "box": {"x1": float(row[0]), "y1": float(row[1]), "x2": float(row[2]), "y2": float(row[3])},
            }
            if self.boxes.is_track:
                rec["track_id"] = int(row[4])
            if self.masks is not None and i < len(self.masks):
                rec["segments"] = self.masks.xy[i].tolist()
            if self.keypoints is not None and i < len(self.keypoints):
                rec["keypoints"] = self.keypoints.data[i].tolist()
            out.append(rec)
        return out

    def verbose(self) -> str:
        """Log string like the reference's '2 persons, 1 car' summaries."""
        if self.probs is not None:
            return ", ".join(
                f"{self.names.get(i, i)} {self.probs.data[i]:.2f}" for i in self.probs.top5
            )
        counts: Dict[str, int] = {}
        src = self.obb if self.obb is not None else self.boxes
        if src is None or len(src) == 0:
            return "(no detections)"
        for c in src.cls:
            name = self.names.get(int(c), str(int(c)))
            counts[name] = counts.get(name, 0) + 1
        return ", ".join(f"{n} {k}{'s' if n > 1 else ''}" for k, n in counts.items())

    def save_txt(self, path, save_conf: bool = True):
        """YOLO-format txt rows (reference results.py save_txt)."""
        h, w = self.orig_shape
        lines = []
        if self.probs is not None:
            lines = [f"{self.probs.data[i]:.2f} {self.names.get(i, i)}" for i in self.probs.top5]
        elif self.obb is not None:
            for row in self.obb.data:
                pts = OBB(row.reshape(1, -1)).xyxyxyxy[0] / np.array([w, h])
                coords = " ".join(f"{v:.6f}" for v in pts.reshape(-1))
                lines.append(f"{int(row[6])} {coords}" + (f" {row[5]:.6f}" if save_conf else ""))
        else:
            for i, row in enumerate(self.boxes.data):
                x1, y1, x2, y2 = row[:4]
                xywhn = ((x1 + x2) / 2 / w, (y1 + y2) / 2 / h, (x2 - x1) / w, (y2 - y1) / h)
                line = f"{int(row[-1])} " + " ".join(f"{v:.6f}" for v in xywhn)
                if save_conf:
                    line += f" {row[-2]:.6f}"
                lines.append(line)
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text("\n".join(lines) + ("\n" if lines else ""))
        return path

    def save_crop(self, save_dir, file_name: Optional[str] = None):
        """Save per-detection crops under save_dir/<class name>/ (reference
        results.py save_crop)."""
        import cv2

        if self.orig_img is None or self.boxes is None:
            return []
        stem = Path(file_name or self.path or "im").stem
        saved = []
        h, w = self.orig_shape
        for i, row in enumerate(self.boxes.data):
            x1, y1, x2, y2 = (int(np.clip(v, 0, lim)) for v, lim in
                              zip(row[:4], (w, h, w, h)))
            if x2 <= x1 or y2 <= y1:
                continue
            name = self.names.get(int(row[-1]), str(int(row[-1])))
            d = Path(save_dir) / name
            d.mkdir(parents=True, exist_ok=True)
            out = d / f"{stem}_{i}.jpg"
            cv2.imwrite(str(out), cv2.cvtColor(self.orig_img[y1:y2, x1:x2], cv2.COLOR_RGB2BGR))
            saved.append(out)
        return saved

    def plot(self, img: Optional[np.ndarray] = None, color=(255, 64, 64),
             kpt_radius: int = 3):
        """Draw detections (+ masks / keypoints / rotated boxes) on the image."""
        import cv2

        if img is None:
            img = self.orig_img
        canvas = img.copy() if img is not None else np.zeros((*self.orig_shape, 3), np.uint8)
        if self.probs is not None:
            label = f"{self.names.get(self.probs.top1, self.probs.top1)} {self.probs.top1conf:.2f}"
            cv2.putText(canvas, label, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7, color, 2)
            return canvas
        if self.masks is not None and len(self.masks):
            overlay = canvas.copy()
            for j, m in enumerate(self.masks.data):
                cc = tuple(int(v) for v in np.array(color) * (0.5 + 0.5 * ((j % 3) / 2)))
                overlay[m.astype(bool)] = cc
            canvas = cv2.addWeighted(canvas, 0.6, overlay, 0.4, 0)
        if self.obb is not None:
            for row, pts in zip(self.obb.data, self.obb.xyxyxyxy):
                cv2.polylines(canvas, [pts.astype(np.int32)], True, color, 2)
                label = f"{self.names.get(int(row[6]), int(row[6]))} {row[5]:.2f}"
                cv2.putText(canvas, label, (int(pts[0, 0]), max(int(pts[0, 1]) - 4, 12)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
            return canvas
        if self.boxes is not None:
            for row in self.boxes.data:
                x1, y1, x2, y2 = (int(v) for v in row[:4])
                cv2.rectangle(canvas, (x1, y1), (x2, y2), color, 2)
                label = f"{self.names.get(int(row[-1]), int(row[-1]))} {row[-2]:.2f}"
                if self.boxes.is_track:
                    label = f"id:{int(row[4])} " + label
                cv2.putText(canvas, label, (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        if self.keypoints is not None:
            for kp in self.keypoints.data:
                for x, y, c in kp:
                    if c > 0.25:
                        cv2.circle(canvas, (int(x), int(y)), kpt_radius, color, -1)
        return canvas


def _load_source(source, imgsz=None):
    """Resolve a predict source to ([RGB images], [paths])."""
    import cv2

    if isinstance(source, (str, Path)):
        p = Path(source)
        paths = sorted(p.glob("*")) if p.is_dir() else [p]
        imgs, names = [], []
        for f in paths:
            im = cv2.imread(str(f))
            if im is not None:
                imgs.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB))
                names.append(str(f))
        return imgs, names
    if isinstance(source, np.ndarray):
        return [source], [None]
    src = list(source)
    return src, [None] * len(src)


class BasePredictor:
    """Shared batching / letterbox / rescale plumbing for task predictors."""

    def __init__(self, model: DetectionModel, conf: float = 0.25, iou: float = 0.45,
                 max_det: int = 300, imgsz: int = 640, device_preprocess: bool = True,
                 agnostic_nms: bool = False, classes=None):
        self.model = model
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.imgsz = imgsz
        # reference NMS flags (utils/ops.py:167): agnostic=True suppresses
        # across classes; classes=[…] keeps only those class ids
        self.agnostic_nms = bool(agnostic_nms)
        if classes is None:
            self.classes = None
        else:
            self.classes = tuple(int(c) for c in (classes if isinstance(classes, (list, tuple)) else [classes]))
        # fused device preprocessing (kernels/preprocess.py): uint8 frames
        # ship to the device as-is (4x less transfer) and letterbox+normalize
        # fuse into the inference program — replaces the reference's host
        # LetterBox + /255 (engine/predictor.py:116, data/augment.py:1477)
        self.device_preprocess = device_preprocess
        # where computations actually land (the axon plugin ignores
        # JAX_PLATFORMS, so honor jax_default_device — tests pin it to CPU)
        self._on_tpu = next(iter(jnp.zeros(()).devices())).platform == "tpu"
        self._infer = jax.jit(self.infer)
        self._infer_u8 = jax.jit(self._infer_from_u8)

    def infer(self, variables, img):  # pragma: no cover - overridden
        raise NotImplementedError

    def _mask_classes(self, pred):
        """Zero the score channels of classes not in `classes` (reference
        non_max_suppression classes= filter): they can never pass conf_thres,
        so the fixed-shape NMS needs no dynamic row filter.

        pred: (B, 4+nc[+extra], A) channels-first decode output (the Detect
        head inference layout, NMS in_format='no_a')."""
        if self.classes is None:
            return pred
        nc = self.model.nc
        keep = jnp.zeros((nc,), pred.dtype).at[jnp.asarray(self.classes)].set(1)
        return jnp.concatenate(
            [pred[:, :4], pred[:, 4:4 + nc] * keep[None, :, None], pred[:, 4 + nc:]], 1)

    def _infer_from_u8(self, variables, images_u8):
        from ..kernels.preprocess import letterbox_normalize, letterbox_normalize_xla

        fn = letterbox_normalize if self._on_tpu else letterbox_normalize_xla
        img = fn(images_u8, (self.imgsz, self.imgsz), scaleup=False)
        return self.infer(variables, img)  # f32 like the host path; flax casts

    def __call__(self, variables, source, batch_size: int = 16) -> List[Results]:
        images, paths = _load_source(source)
        if self.device_preprocess and all(
                im.dtype == np.uint8 and im.ndim == 3 for im in images):
            return self._call_device_preprocess(variables, images, paths, batch_size)
        results: List[Results] = []
        for start in range(0, len(images), batch_size):
            chunk = images[start : start + batch_size]
            lb = [letterbox(im, (self.imgsz, self.imgsz), scaleup=False) for im in chunk]
            batch = np.stack([b[0] for b in lb]).astype(np.float32) / 255.0
            out = jax.device_get(self._infer(variables, jnp.asarray(batch)))
            for i, im in enumerate(chunk):
                results.append(
                    self.build_result(out, i, im, lb[i][1], lb[i][2], paths[start + i])
                )
        return results

    def _call_device_preprocess(self, variables, images, paths, batch_size: int) -> List[Results]:
        """uint8-in → boxes-out: bucket sources by (H, W) so each size is one
        compilation, ship uint8, letterbox+normalize on device."""
        from ..kernels.preprocess import letterbox_geometry

        buckets: Dict[tuple, List[int]] = {}
        for i, im in enumerate(images):
            buckets.setdefault(im.shape[:2], []).append(i)
        by_idx: Dict[int, Results] = {}
        for hw, idxs in buckets.items():
            r, _, _, top, left = letterbox_geometry(
                hw[0], hw[1], self.imgsz, self.imgsz, scaleup=False)
            for start in range(0, len(idxs), batch_size):
                ids = idxs[start : start + batch_size]
                u8 = jnp.asarray(np.stack([images[j] for j in ids]))
                out = jax.device_get(self._infer_u8(variables, u8))
                for bi, j in enumerate(ids):
                    by_idx[j] = self.build_result(
                        out, bi, images[j], r, (float(left), float(top)), paths[j])
        return [by_idx[i] for i in range(len(images))]

    @staticmethod
    def _rescale_boxes(d, gain, pad, shape):
        d = np.asarray(d, dtype=np.float64).copy()
        d[:, [0, 2]] = (d[:, [0, 2]] - pad[0]) / gain
        d[:, [1, 3]] = (d[:, [1, 3]] - pad[1]) / gain
        h, w = shape
        d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
        d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
        return d


class DetectionPredictor(BasePredictor):
    """NMS + scale_boxes → Results (reference models/yolo/detect/predict.py:8)."""

    def infer(self, variables, img):
        pred = self._mask_classes(self.model.predict(variables, img))
        return non_max_suppression(
            pred, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det,
            class_agnostic=self.agnostic_nms
        )

    def build_result(self, out, i, im, gain, pad, path):
        dets, num = out
        d = self._rescale_boxes(dets[i][: int(num[i])], gain, pad, im.shape[:2])
        return Results(Boxes(d), orig_shape=im.shape[:2], path=path,
                       names=self.model.names, orig_img=im)


class SegmentationPredictor(BasePredictor):
    """Masks from NMS-kept coefficients × prototypes (reference
    models/yolo/segment/predict.py)."""

    def infer(self, variables, img):
        from ..nn.heads import flatten_levels

        outputs = self.model.apply(variables, img)
        det_maps, coeffs, protos = outputs
        pred = self._mask_classes(self.model.decode_outputs(outputs, img_size=img.shape[1]))
        dets, num, anchor_idx = non_max_suppression(
            pred, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det,
            nc=self.model.nc, return_idx=True, class_agnostic=self.agnostic_nms)
        kept = jnp.take_along_axis(flatten_levels(coeffs), anchor_idx[..., None], axis=1)
        return dets, num, kept, protos

    def build_result(self, out, i, im, gain, pad, path):
        import cv2

        from ..nn.heads import decode_masks

        dets, num, kept, protos = out
        k = int(num[i])
        d_in = dets[i][:k]  # input-image pixels, pre-rescale (masks crop here)
        pm = np.asarray(decode_masks(
            jnp.asarray(kept[i][:k]), jnp.asarray(protos[i]),
            jnp.asarray(d_in[:, :4]), (self.imgsz, self.imgsz)))
        d = self._rescale_boxes(d_in, gain, pad, im.shape[:2])
        h, w = im.shape[:2]
        # proto-res masks → input-res letterboxed → un-pad → original size
        masks = np.zeros((k, h, w), bool)
        hm, wm = pm.shape[1:] if k else (0, 0)
        for j in range(k):
            m = cv2.resize(pm[j], (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
            x0, y0 = int(round(pad[0])), int(round(pad[1]))
            x1 = self.imgsz - x0 or self.imgsz
            y1 = self.imgsz - y0 or self.imgsz
            crop = m[y0:y1, x0:x1]
            masks[j] = cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR) > 0.5
        return Results(Boxes(d), orig_shape=(h, w), path=path, names=self.model.names,
                       masks=Masks(masks), orig_img=im)


class PosePredictor(BasePredictor):
    """Keypoints decoded per kept detection (reference models/yolo/pose/predict.py)."""

    def __init__(self, model, kpt_shape=(17, 3), **kw):
        self.kpt_shape = tuple(kpt_shape)
        super().__init__(model, **kw)

    def infer(self, variables, img):
        from ..losses.extra import kpts_decode
        from ..nn.heads import flatten_levels
        from ..ops.anchors import make_anchors

        outputs = self.model.apply(variables, img)
        det_maps, kpt_maps = outputs
        pred = self._mask_classes(self.model.decode_outputs(outputs, img_size=img.shape[1]))
        dets, num, anchor_idx = non_max_suppression(
            pred, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det,
            nc=self.model.nc, return_idx=True, class_agnostic=self.agnostic_nms)
        shapes = [f.shape[1:3] for f in det_maps]
        anchors, stride_t = make_anchors(shapes, self.model.strides)
        nk, nd = self.kpt_shape
        pk = flatten_levels(kpt_maps).reshape(img.shape[0], -1, nk, nd)
        dec = kpts_decode(anchors, pk)
        dec = dec.at[..., :2].multiply(stride_t[None, :, :, None])
        if nd == 3:
            # visibility channel is a raw logit; the reference Pose head
            # sigmoids it at inference (modules/head.py kpts_decode) so
            # Keypoints.conf / plot gates compare in probability space
            dec = dec.at[..., 2].set(jax.nn.sigmoid(dec[..., 2]))
        kept = jnp.take_along_axis(dec, anchor_idx[..., None, None], axis=1)
        return dets, num, kept

    def build_result(self, out, i, im, gain, pad, path):
        dets, num, kept = out
        k = int(num[i])
        d = self._rescale_boxes(dets[i][:k], gain, pad, im.shape[:2])
        kp = np.asarray(kept[i][:k], np.float64)
        kp[..., 0] = (kp[..., 0] - pad[0]) / gain
        kp[..., 1] = (kp[..., 1] - pad[1]) / gain
        if kp.shape[-1] == 2:  # decode without conf channel
            kp = np.concatenate([kp, np.ones((*kp.shape[:-1], 1))], -1)
        return Results(Boxes(d), orig_shape=im.shape[:2], path=path,
                       names=self.model.names, keypoints=Keypoints(kp), orig_img=im)


class OBBPredictor(BasePredictor):
    """Rotated-box NMS → OBB container (reference models/yolo/obb/predict.py)."""

    def infer(self, variables, img):
        pred = self._mask_classes(self.model.predict(variables, img))  # (B, 4+nc+1, A)
        return non_max_suppression_rotated(
            pred, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det,
            nc=self.model.nc)

    def build_result(self, out, i, im, gain, pad, path):
        dets, num = out
        k = int(num[i])
        d = np.asarray(dets[i][:k], np.float64).copy()  # [x,y,w,h,a,conf,cls]
        d[:, 0] = (d[:, 0] - pad[0]) / gain
        d[:, 1] = (d[:, 1] - pad[1]) / gain
        d[:, 2:4] /= gain
        return Results(None, orig_shape=im.shape[:2], path=path,
                       names=self.model.names, obb=OBB(d), orig_img=im)


class ClassificationPredictor(BasePredictor):
    """Softmax over the Classify head → Probs (reference
    models/yolo/classify/predict.py)."""

    def infer(self, variables, img):
        return self.model.predict(variables, img)  # already softmaxed (B, nc)

    def build_result(self, out, i, im, gain, pad, path):
        return Results(None, orig_shape=im.shape[:2], path=path,
                       names=self.model.names, probs=Probs(np.asarray(out[i])),
                       orig_img=im)


TASK_PREDICTORS = {
    "detect": DetectionPredictor,
    "segment": SegmentationPredictor,
    "pose": PosePredictor,
    "obb": OBBPredictor,
    "classify": ClassificationPredictor,
}
