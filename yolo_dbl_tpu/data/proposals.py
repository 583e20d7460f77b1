"""Region proposals: selective-search equivalent (host-side numpy).

The reference calls cv2.ximgproc's SelectiveSearchFast (models/RCNN/utils.py:26),
which is absent in this image. This module implements the same pipeline from
the Uijlings et al. 2013 paper: Felzenszwalb-Huttenlocher graph segmentation
(union-find over sorted edges) followed by hierarchical region merging with
color-histogram / size / fill similarity — producing xyxy proposals ordered
by merge hierarchy like SelectiveSearchFast. Host-side preprocessing only
(SURVEY.md §2.11: selective search stays a CPU stage feeding the pipeline).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import cv2
import numpy as np


class _UnionFind:
    def __init__(self, n):
        self.parent = np.arange(n)
        self.size = np.ones(n, dtype=np.int64)
        self.int_diff = np.zeros(n)  # internal difference (max edge in MST)

    def find(self, a):
        root = a
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[a] != root:
            self.parent[a], a = root, self.parent[a]
        return root

    def union(self, a, b, w):
        a, b = self.find(a), self.find(b)
        if a == b:
            return a
        if self.size[a] < self.size[b]:
            a, b = b, a
        self.parent[b] = a
        self.size[a] += self.size[b]
        self.int_diff[a] = max(self.int_diff[a], self.int_diff[b], w)
        return a


def felzenszwalb(img: np.ndarray, scale: float = 100.0, sigma: float = 0.8, min_size: int = 50) -> np.ndarray:
    """Graph-based segmentation → int32 label map (H, W)."""
    img = cv2.GaussianBlur(img.astype(np.float32), (0, 0), sigma)
    h, w = img.shape[:2]
    idx = np.arange(h * w).reshape(h, w)

    edges = []
    for dy, dx in [(0, 1), (1, 0), (1, 1), (1, -1)]:
        ys, ye = max(0, -dy), h - max(0, dy)
        xs, xe = max(0, -dx), w - max(0, dx)
        a = idx[ys:ye, xs:xe]
        b = idx[ys + dy : ye + dy, xs + dx : xe + dx]
        diff = np.sqrt(((img[ys:ye, xs:xe] - img[ys + dy : ye + dy, xs + dx : xe + dx]) ** 2).sum(-1))
        edges.append(np.stack([a.ravel(), b.ravel(), diff.ravel()], axis=1))
    edges = np.concatenate(edges)
    edges = edges[np.argsort(edges[:, 2])]

    uf = _UnionFind(h * w)
    for a, b, wgt in edges:
        a, b = int(a), int(b)
        ra, rb = uf.find(a), uf.find(b)
        if ra == rb:
            continue
        thr_a = uf.int_diff[ra] + scale / uf.size[ra]
        thr_b = uf.int_diff[rb] + scale / uf.size[rb]
        if wgt <= min(thr_a, thr_b):
            uf.union(ra, rb, wgt)
    # merge small components
    for a, b, wgt in edges:
        ra, rb = uf.find(int(a)), uf.find(int(b))
        if ra != rb and (uf.size[ra] < min_size or uf.size[rb] < min_size):
            uf.union(ra, rb, wgt)

    labels = np.array([uf.find(i) for i in range(h * w)])
    _, labels = np.unique(labels, return_inverse=True)
    return labels.reshape(h, w).astype(np.int32)


def _region_stats(img_hsv, labels, n):
    """Per-region bbox, size and color histogram (25 bins × 3 channels)."""
    h, w = labels.shape
    ys, xs = np.mgrid[0:h, 0:w]
    flat = labels.ravel()
    boxes = np.zeros((n, 4))
    boxes[:, 0] = np.full(n, w)
    boxes[:, 1] = np.full(n, h)
    np.minimum.at(boxes[:, 0], flat, xs.ravel())
    np.minimum.at(boxes[:, 1], flat, ys.ravel())
    np.maximum.at(boxes[:, 2], flat, xs.ravel())
    np.maximum.at(boxes[:, 3], flat, ys.ravel())
    sizes = np.bincount(flat, minlength=n).astype(np.float64)
    hists = np.zeros((n, 75))
    for c in range(3):
        bins = np.minimum((img_hsv[..., c].astype(np.int64) * 25) // 256, 24).ravel()
        np.add.at(hists, (flat, c * 25 + bins), 1.0)
    hists /= np.maximum(sizes[:, None], 1)
    return boxes, sizes, hists


def selective_search(image: np.ndarray, max_proposals: int = 2000,
                     scale: float = 100.0, min_size: int = 50) -> np.ndarray:
    """Selective-search proposals, (N, 4) xywh like cv2's ss.process().

    image: HWC uint8 RGB.
    """
    h, w = image.shape[:2]
    im_size = float(h * w)
    labels = felzenszwalb(image, scale=scale, min_size=min_size)
    n = labels.max() + 1
    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV)
    boxes, sizes, hists = _region_stats(hsv, labels, n)

    # adjacency from horizontally/vertically touching labels
    pairs = set()
    a, b = labels[:, :-1].ravel(), labels[:, 1:].ravel()
    for x, y in zip(a[a != b], b[a != b]):
        pairs.add((min(x, y), max(x, y)))
    a, b = labels[:-1, :].ravel(), labels[1:, :].ravel()
    for x, y in zip(a[a != b], b[a != b]):
        pairs.add((min(x, y), max(x, y)))

    def similarity(i, j):
        s_color = np.minimum(hists[i], hists[j]).sum() / 3.0
        s_size = 1.0 - (sizes[i] + sizes[j]) / im_size
        bx = [min(boxes[i][0], boxes[j][0]), min(boxes[i][1], boxes[j][1]),
              max(boxes[i][2], boxes[j][2]), max(boxes[i][3], boxes[j][3])]
        bb_size = (bx[2] - bx[0] + 1) * (bx[3] - bx[1] + 1)
        s_fill = 1.0 - (bb_size - sizes[i] - sizes[j]) / im_size
        return s_color + s_size + s_fill

    sims = {p: similarity(*p) for p in pairs}
    proposals = [tuple(boxes[i]) for i in range(n)]
    boxes_l = {i: boxes[i].copy() for i in range(n)}
    sizes_l = {i: sizes[i] for i in range(n)}
    hists_l = {i: hists[i].copy() for i in range(n)}
    next_label = n
    neighbors: Dict[int, set] = {}
    for i, j in pairs:
        neighbors.setdefault(i, set()).add(j)
        neighbors.setdefault(j, set()).add(i)

    while sims and len(proposals) < max_proposals * 2:
        (i, j), _ = max(sims.items(), key=lambda kv: kv[1])
        t = next_label
        next_label += 1
        boxes_l[t] = np.array(
            [min(boxes_l[i][0], boxes_l[j][0]), min(boxes_l[i][1], boxes_l[j][1]),
             max(boxes_l[i][2], boxes_l[j][2]), max(boxes_l[i][3], boxes_l[j][3])]
        )
        sizes_l[t] = sizes_l[i] + sizes_l[j]
        hists_l[t] = (hists_l[i] * sizes_l[i] + hists_l[j] * sizes_l[j]) / sizes_l[t]
        proposals.append(tuple(boxes_l[t]))
        merged_nb = (neighbors.get(i, set()) | neighbors.get(j, set())) - {i, j}
        # remove stale pairs
        for k in list(sims):
            if i in k or j in k:
                del sims[k]
        for nb in merged_nb:
            neighbors.setdefault(nb, set()).discard(i)
            neighbors[nb].discard(j)
            neighbors[nb].add(t)
            key = (min(nb, t), max(nb, t))

            def sim_merged(x, y):
                s_color = np.minimum(hists_l[x], hists_l[y]).sum() / 3.0
                s_size = 1.0 - (sizes_l[x] + sizes_l[y]) / im_size
                bx = [min(boxes_l[x][0], boxes_l[y][0]), min(boxes_l[x][1], boxes_l[y][1]),
                      max(boxes_l[x][2], boxes_l[y][2]), max(boxes_l[x][3], boxes_l[y][3])]
                bb = (bx[2] - bx[0] + 1) * (bx[3] - bx[1] + 1)
                return s_color + s_size + (1.0 - (bb - sizes_l[x] - sizes_l[y]) / im_size)

            sims[key] = sim_merged(nb, t)
        neighbors[t] = merged_nb
        for x in (i, j):
            neighbors.pop(x, None)

    out = []
    seen = set()
    for x1, y1, x2, y2 in proposals:
        key = (int(x1), int(y1), int(x2), int(y2))
        if key in seen or x2 <= x1 or y2 <= y1:
            continue
        seen.add(key)
        out.append([x1, y1, x2 - x1 + 1, y2 - y1 + 1])  # xywh like cv2
    return np.asarray(out[:max_proposals], dtype=np.float32)


def create_training_samples(proposals_xyxy, gt_boxes, gt_labels,
                            pos_iou=0.5, neg_iou=0.1):
    """Vectorized pos/neg proposal sampling + bbox regression targets
    (reference models/RCNN/preprocess.py:12 create_training_samples_vectorized;
    labels are shifted +1, background handled by the caller)."""
    if len(gt_boxes) == 0 or len(proposals_xyxy) == 0:
        return (np.zeros((0, 4)), proposals_xyxy, np.zeros((0,), np.int64), np.zeros((0, 4)))
    p = proposals_xyxy[:, None]
    g = gt_boxes[None]
    xa = np.maximum(p[..., 0], g[..., 0])
    ya = np.maximum(p[..., 1], g[..., 1])
    xb = np.minimum(p[..., 2], g[..., 2])
    yb = np.minimum(p[..., 3], g[..., 3])
    inter = np.maximum(0, xb - xa) * np.maximum(0, yb - ya)
    pa = (proposals_xyxy[:, 2] - proposals_xyxy[:, 0]) * (proposals_xyxy[:, 3] - proposals_xyxy[:, 1])
    ga = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    iou = inter / (pa[:, None] + ga[None] - inter + 1e-6)
    max_iou = iou.max(axis=1)
    best = iou.argmax(axis=1)

    pos_idx = np.where(max_iou >= pos_iou)[0]
    neg_idx = np.where(max_iou < neg_iou)[0]
    pos_rois = proposals_xyxy[pos_idx]
    neg_rois = proposals_xyxy[neg_idx]
    if len(pos_idx):
        labels = gt_labels[best[pos_idx]] + 1
        gm = gt_boxes[best[pos_idx]]
        pw = pos_rois[:, 2] - pos_rois[:, 0]
        ph = pos_rois[:, 3] - pos_rois[:, 1]
        px = pos_rois[:, 0] + pw / 2
        py = pos_rois[:, 1] + ph / 2
        gw = gm[:, 2] - gm[:, 0]
        gh = gm[:, 3] - gm[:, 1]
        gx = gm[:, 0] + gw / 2
        gy = gm[:, 1] + gh / 2
        targets = np.stack(
            [(gx - px) / pw, (gy - py) / ph, np.log(gw / (pw + 1e-6)), np.log(gh / (ph + 1e-6))], axis=1
        )
    else:
        labels, targets = np.zeros((0,), np.int64), np.zeros((0, 4))
    return pos_rois, neg_rois, labels, targets
