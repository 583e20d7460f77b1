"""Batch assembly: fixed-shape padded batches for the jitted train/val steps.

Replaces the reference's collate_fn + InfiniteDataLoader (data/build.py:28,
data/dataset.py collate_fn): instead of a flat (n_total, 6) target tensor
with image indices, GTs are padded per image to `max_gt` with a validity
mask — the shape the TAL assigner consumes directly, constant across steps
so the train step compiles exactly once.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Dict, Iterator, Optional

import numpy as np

from .augment import TrainTransforms, ValTransforms
from .dataset import YOLODataset


def format_batch(images, labels_list, imgsz: int, max_gt: int) -> Dict[str, np.ndarray]:
    """Stack images and pad labels. Boxes become normalized xywh (the loss
    contract, see losses/detection.py)."""
    b = len(images)
    # uint8 stays uint8: batches ship to the device at 1/4 the bytes and the
    # train/val steps normalize on device (kernels/preprocess.device_normalize)
    # — the fused-preprocess contract (SURVEY §7-d). Float inputs keep the
    # legacy host /255.
    img = np.stack(images)
    if img.dtype != np.uint8:
        img = img.astype(np.float32) / 255.0  # NHWC [0,1]
    gt_boxes = np.zeros((b, max_gt, 4), np.float32)
    gt_cls = np.zeros((b, max_gt), np.int32)
    gt_mask = np.zeros((b, max_gt), np.float32)
    for i, lab in enumerate(labels_list):
        boxes = lab["boxes"][:max_gt]
        n = len(boxes)
        if n:
            x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
            cx, cy = (x1 + x2) / 2 / imgsz, (y1 + y2) / 2 / imgsz
            w, h = (x2 - x1) / imgsz, (y2 - y1) / imgsz
            gt_boxes[i, :n] = np.stack([cx, cy, w, h], axis=1)
            gt_cls[i, :n] = lab["cls"][:max_gt][:n]
            gt_mask[i, :n] = 1.0
    return {"img": img, "gt_boxes": gt_boxes, "gt_cls": gt_cls, "gt_mask": gt_mask}


def format_batch_task(images, labels_list, imgsz: int, max_gt: int, task: str = "detect",
                      mask_ratio: int = 4, kpt_shape=(17, 3)) -> Dict[str, np.ndarray]:
    """format_batch plus the task-specific padded targets: gt_masks
    (B, M, Hm, Wm) rasterized at the prototype resolution for segment,
    gt_kpts (B, M, K, 3) normalized xy for pose, 5-column normalized xywhr
    gt_boxes for obb (reference dataset.py Format transform)."""
    batch = format_batch(images, labels_list, imgsz, max_gt)
    b = len(images)
    if task == "segment":
        import cv2 as _cv2

        hm = wm = imgsz // mask_ratio
        gt_masks = np.zeros((b, max_gt, hm, wm), np.float32)
        for i, lab in enumerate(labels_list):
            for j, poly in enumerate(lab.get("segments", [])[:max_gt]):
                m = np.zeros((hm, wm), np.uint8)
                pts = (np.asarray(poly, np.float32) / mask_ratio).astype(np.int32)
                _cv2.fillPoly(m, [pts], 1)
                gt_masks[i, j] = m
        batch["gt_masks"] = gt_masks
    elif task == "pose":
        k, nd = kpt_shape
        gt_kpts = np.zeros((b, max_gt, k, nd), np.float32)
        for i, lab in enumerate(labels_list):
            kp = lab.get("keypoints")
            if kp is not None and len(kp):
                n = min(len(kp), max_gt)
                kk = kp[:n].astype(np.float32).copy()
                kk[..., 0] /= imgsz  # back to [0, 1] (loss contract)
                kk[..., 1] /= imgsz
                gt_kpts[i, :n] = kk[:, :k]
        batch["gt_kpts"] = gt_kpts
    elif task == "obb":
        gt5 = np.zeros((b, max_gt, 5), np.float32)
        for i, lab in enumerate(labels_list):
            rb = lab.get("rboxes")
            if rb is not None and len(rb):
                n = min(len(rb), max_gt)
                gt5[i, :n] = rb[:n]
                batch["gt_mask"][i, :n] = 1.0
                batch["gt_cls"][i, :n] = lab["cls"][:n]
        batch["gt_boxes"] = gt5
    return batch


class DataLoader:
    """Simple epoch iterator with background prefetch thread.

    The reference uses torch DataLoader worker processes
    (data/build.py:135); here decode+augment runs on host threads while the
    TPU executes the previous step — the same overlap, no process pool.
    With ``workers > 1`` the per-sample decode+augment additionally fans out
    over a thread pool (cv2's decode/resize/warp release the GIL, so threads
    scale across host cores the way the reference's ``workers`` processes
    do). Sample RNG is then split per sample via ``Generator.spawn`` — still
    deterministic for a fixed (seed, epoch, workers>1), but a different
    stream than the sequential path.
    """

    def __init__(self, dataset: YOLODataset, batch_size: int = 16, imgsz: int = 640,
                 augment: bool = True, hyp: Optional[dict] = None, max_gt: int = 64,
                 shuffle: Optional[bool] = None, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, task: Optional[str] = None, workers: int = 0):
        self.dataset = dataset
        self.task = task or getattr(dataset, "task", "detect")
        if self.task == "obb":
            # rotated boxes are not carried through mosaic/perspective yet —
            # obb runs the letterbox-only path
            augment = False
        if self.task == "pose" and augment:
            # reference v8_transforms: keypoint left/right flip requires a
            # flip_idx from the dataset yaml; without one fliplr is disabled
            hyp = dict(hyp or {})
            if not hyp.get("flip_idx"):
                hyp["flip_idx"] = None
                hyp["fliplr"] = 0.0
        self.batch_size = batch_size
        self.imgsz = imgsz
        self.max_gt = max_gt
        self.augment = augment
        self.transforms = TrainTransforms(imgsz, hyp) if augment else ValTransforms(imgsz)
        self.shuffle = augment if shuffle is None else shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.workers = int(workers)
        self._pool = None
        self._native = None  # native decode pool: None = untried, False = off
        self._epoch = 0

    def close_mosaic(self):
        if isinstance(self.transforms, TrainTransforms):
            self.transforms.close_mosaic()

    def close(self):
        """Shut down the decode worker pools. Idempotent; the loader remains
        usable (a later iteration lazily recreates the pools)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
        if self._native not in (None, False):
            self._native.close()
            self._native = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int):
        """Align the shuffle stream so the NEXT iteration reproduces epoch
        index `epoch` (0-based) of a fresh run — the resume equivalent of
        DistributedSampler.set_epoch (reference data/build.py:135)."""
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _native_val_batch(self, idxs):
        """Eval-path fast lane: decode + letterbox + collate the whole batch
        in the native C++ worker pool (native/loader.py), writing straight
        into the (B, S, S, 3) uint8 buffer the jitted step consumes. Detect
        task only (side-channel tasks keep the Python path). Semantics match
        ValTransforms: combined gain = min(S/h0, S/w0) with scale-up (the
        two-stage load_resized→letterbox composition), centered 114 padding,
        boxes mapped to letterboxed pixel space. Returns None to fall back.
        """
        import os

        if (self.augment or self.task != "detect"
                or os.environ.get("YOLO_DBL_NATIVE_LOADER", "1") == "0"):
            return None
        ds = self.dataset
        if getattr(ds, "_cache", None) is not None or not hasattr(ds, "im_files"):
            return None  # RAM-cached datasets: decode happens once anyway
        if self._native is None:
            try:
                from ..native.loader import NativePool

                self._native = NativePool(self.workers if self.workers > 1
                                          else (os.cpu_count() or 4))
            except Exception:
                self._native = False
        if self._native is False:
            return None
        paths = [ds.im_files[int(j)] for j in idxs]
        img, gains, pads, orig_hw, status = self._native.decode_letterbox_batch(
            paths, self.imgsz, scaleup=True)
        b = len(idxs)
        gt_boxes = np.zeros((b, self.max_gt, 4), np.float32)
        gt_cls = np.zeros((b, self.max_gt), np.int32)
        gt_mask = np.zeros((b, self.max_gt), np.float32)
        labels_meta = []
        for i, j in enumerate(idxs):
            if status[i] != 0:
                # unreadable/undecodable (or non-JPEG/PNG) file: recover this
                # slot through the Python transform
                im_i, lab = self.transforms(ds, int(j), None)
                img[i] = im_i
                boxes, cls = lab["boxes"], lab["cls"]
                labels_meta.append(lab)
            else:
                lab0 = ds.labels[int(j)]
                h0, w0 = int(orig_hw[i, 0]), int(orig_hw[i, 1])
                xywhn = lab0["xywhn"][:, :4]
                g, (px, py) = float(gains[i]), pads[i]
                if len(xywhn):
                    cx, cy = xywhn[:, 0] * w0 * g + px, xywhn[:, 1] * h0 * g + py
                    bw, bh = xywhn[:, 2] * w0 * g, xywhn[:, 3] * h0 * g
                    boxes = np.stack(
                        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1
                    ).astype(np.float32)
                else:
                    boxes = np.zeros((0, 4), np.float32)
                cls = lab0["cls"].copy()
                labels_meta.append({"boxes": boxes, "cls": cls,
                                    "orig_shape": (h0, w0),
                                    "ratio_pad": (g, (float(px), float(py)))})
            n = min(len(boxes), self.max_gt)
            if n:
                bx = boxes[:n]
                x1, y1, x2, y2 = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
                gt_boxes[i, :n] = np.stack(
                    [(x1 + x2) / 2, (y1 + y2) / 2, (x2 - x1), (y2 - y1)], 1
                ) / self.imgsz
                gt_cls[i, :n] = cls[:n]
                gt_mask[i, :n] = 1.0
        batch = {"img": img, "gt_boxes": gt_boxes, "gt_cls": gt_cls,
                 "gt_mask": gt_mask, "indices": np.asarray(idxs),
                 "labels": labels_meta}
        return batch

    def _make_batches(self):
        rng = np.random.default_rng(self.seed + self._epoch)
        order = rng.permutation(len(self.dataset)) if self.shuffle else np.arange(len(self.dataset))
        nb = len(self)
        for bi in range(nb):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            if len(idxs) == 0:
                break
            nb_batch = self._native_val_batch(idxs)
            if nb_batch is not None:
                yield nb_batch
                continue
            if self.workers > 1:
                if self._pool is None:
                    from concurrent.futures import ThreadPoolExecutor

                    self._pool = ThreadPoolExecutor(max_workers=self.workers,
                                                    thread_name_prefix="yolo-dbl-data")
                rngs = rng.spawn(len(idxs))
                out = list(self._pool.map(
                    lambda a: self.transforms(self.dataset, int(a[0]), a[1]),
                    zip(idxs, rngs)))
                images = [o[0] for o in out]
                labels = [o[1] for o in out]
            else:
                images, labels = [], []
                for j in idxs:
                    img, lab = self.transforms(self.dataset, int(j), rng)
                    images.append(img)
                    labels.append(lab)
            if self.task != "detect":
                batch = format_batch_task(images, labels, self.imgsz, self.max_gt, self.task)
            else:
                batch = format_batch(images, labels, self.imgsz, self.max_gt)
            batch["indices"] = np.asarray(idxs)
            if not self.augment:
                batch["labels"] = labels  # keep eval metadata (ratio_pad, orig_shape)
            yield batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._epoch += 1
        if self.prefetch <= 0:
            yield from self._make_batches()
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for b in self._make_batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
