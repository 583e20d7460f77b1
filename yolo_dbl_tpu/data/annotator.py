"""Auto-annotation: detector proposals → SAM box-prompted masks → seg labels.

Equivalent of the reference's data/annotator.py auto_annotate (:8): run a
detection model over a folder, feed each detection box to SAM as a prompt,
and write YOLO-segment label files (`cls x1 y1 x2 y2 …` normalized polygon).
Upstream downloads both checkpoints; here the caller passes initialized
(model, variables) pairs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import non_max_suppression


def _mask_to_polygon(mask: np.ndarray, max_points: int = 64) -> Optional[np.ndarray]:
    """Largest external contour of a binary mask → (N, 2) polygon."""
    import cv2

    cnts, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL,
                               cv2.CHAIN_APPROX_SIMPLE)
    if not cnts:
        return None
    c = max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
    if len(c) > max_points:
        c = c[np.linspace(0, len(c) - 1, max_points).astype(int)]
    return c


def auto_annotate(data, det_model, det_variables, sam_model, sam_variables,
                  conf: float = 0.25, iou: float = 0.45, imgsz: int = 640,
                  max_det: int = 64, classes: Optional[Sequence[int]] = None,
                  output_dir=None):
    """Annotate every image in `data` with detector boxes + SAM masks.

    det_model: a DetectionModel (predict() → (B, 4+nc, A)).
    sam_model: a SAMModel whose img_size matches `imgsz`.
    Writes one YOLO-segment label file per image; returns the output dir.
    """
    import cv2

    data = Path(data)
    out = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    out.mkdir(parents=True, exist_ok=True)
    images = sorted(p for p in data.iterdir()
                    if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp", ".webp"))
    for img_path in images:
        im0 = cv2.cvtColor(cv2.imread(str(img_path)), cv2.COLOR_BGR2RGB)
        h0, w0 = im0.shape[:2]
        im = cv2.resize(im0, (imgsz, imgsz)).astype(np.float32) / 255.0
        pred = det_model.predict(det_variables, jnp.asarray(im)[None])
        dets, counts = non_max_suppression(pred, conf_thres=conf, iou_thres=iou,
                                           max_det=max_det, nc=det_model.nc)
        n = int(counts[0])
        rows = []
        if n:
            keep = np.asarray(dets[0, :n])
            if classes is not None:
                keep = keep[np.isin(keep[:, 5].astype(int), list(classes))]
            if len(keep):
                emb = sam_model.apply(sam_variables, jnp.asarray(im)[None],
                                      method="encode_image")
                # one prompt per batch row: each box decodes its own mask
                nb = len(keep)
                embs = jnp.broadcast_to(emb, (nb, *emb.shape[1:]))
                boxes = jnp.asarray(keep[:, None, :4])  # (N, 1, 4)
                masks, _ = sam_model.apply(sam_variables, embs, boxes=boxes,
                                           multimask_output=False, method="prompt")
                masks = np.asarray(masks[:, 0] > 0)  # (N, g4, g4)
                for det, m in zip(keep, masks):
                    mk = cv2.resize(m.astype(np.uint8), (imgsz, imgsz),
                                    interpolation=cv2.INTER_NEAREST)
                    poly = _mask_to_polygon(mk)
                    if poly is None or len(poly) < 3:
                        continue
                    poly = poly / imgsz
                    coords = " ".join(f"{v:.4f}" for v in poly.reshape(-1))
                    rows.append(f"{int(det[5])} {coords}")
        (out / f"{img_path.stem}.txt").write_text("\n".join(rows) + ("\n" if rows else ""))
    return out
