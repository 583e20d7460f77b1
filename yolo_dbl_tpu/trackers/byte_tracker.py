"""BYTETracker multi-object tracker (host-side numpy).

Equivalent of the reference's trackers/byte_tracker.py:235 (BYTETracker,
STrack): two-stage association — high-score detections matched by IoU to
predicted tracks, then low-score detections rescue unmatched tracks —
with Kalman motion and track lifecycle (new/tracked/lost/removed).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from .kalman import KalmanFilterXYAH

NEW, TRACKED, LOST, REMOVED = 0, 1, 2, 3


def iou_distance(a_boxes: np.ndarray, b_boxes: np.ndarray) -> np.ndarray:
    """1 - IoU cost matrix over xyxy boxes."""
    if len(a_boxes) == 0 or len(b_boxes) == 0:
        return np.ones((len(a_boxes), len(b_boxes)))
    from ..utils.metrics import box_iou_np

    return 1.0 - box_iou_np(a_boxes, b_boxes)


def linear_assignment(cost: np.ndarray, thresh: float) -> Tuple[list, list, list]:
    """Hungarian matching with cost gate (reference trackers/utils/matching.py)."""
    if cost.size == 0:
        return [], list(range(cost.shape[0])), list(range(cost.shape[1]))
    rows, cols = linear_sum_assignment(cost)
    matches, ua, ub = [], [], []
    matched_a, matched_b = set(), set()
    for r, c in zip(rows, cols):
        if cost[r, c] <= thresh:
            matches.append((r, c))
            matched_a.add(r)
            matched_b.add(c)
    ua = [i for i in range(cost.shape[0]) if i not in matched_a]
    ub = [j for j in range(cost.shape[1]) if j not in matched_b]
    return matches, ua, ub


class STrack:
    _count = 0

    def __init__(self, xyxy, score, cls, det_idx=-1):
        self.xyxy = np.asarray(xyxy, np.float64)
        self.score = float(score)
        self.cls = int(cls)
        # index of the originating detection row in this frame's input
        # (reference byte_tracker.py appends it as the dets' last column so
        # masks/keypoints can be re-indexed to surviving tracks)
        self.det_idx = int(det_idx)
        self.mean: Optional[np.ndarray] = None
        self.cov: Optional[np.ndarray] = None
        self.state = NEW
        self.track_id = 0
        self.frame_id = 0
        self.start_frame = 0
        self.tracklet_len = 0

    @staticmethod
    def next_id():
        STrack._count += 1
        return STrack._count

    def to_xyah(self):
        x1, y1, x2, y2 = self.xyxy
        w, h = x2 - x1, y2 - y1
        return np.array([x1 + w / 2, y1 + h / 2, w / max(h, 1e-6), h])

    def kf_xyxy(self):
        if self.mean is None:
            return self.xyxy
        cx, cy, a, h = self.mean[:4]
        w = a * h
        return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])

    def activate(self, kf, frame_id):
        self.track_id = self.next_id()
        self.mean, self.cov = kf.initiate(self.to_xyah())
        self.state = TRACKED
        self.frame_id = self.start_frame = frame_id
        self.tracklet_len = 0

    def predict(self, kf):
        mean = self.mean.copy()
        if self.state != TRACKED:
            mean[7] = 0  # zero height velocity when lost
        self.mean, self.cov = kf.predict(mean, self.cov)

    def update(self, kf, det: "STrack", frame_id):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.cov = kf.update(self.mean, self.cov, det.to_xyah())
        self.state = TRACKED
        self.score = det.score
        self.cls = det.cls
        self.xyxy = det.xyxy
        self.det_idx = det.det_idx

    def re_activate(self, kf, det: "STrack", frame_id, new_id=False):
        self.update(kf, det, frame_id)
        if new_id:
            self.track_id = self.next_id()


class BYTETracker:
    det_class = STrack  # BOTSORT overrides with BOTSTrack (xywh measurements)

    def __init__(self, track_high_thresh=0.5, track_low_thresh=0.1, new_track_thresh=0.6,
                 match_thresh=0.8, track_buffer=30, frame_rate=30):
        self.kf = KalmanFilterXYAH()
        self.tracked: List[STrack] = []
        self.lost: List[STrack] = []
        self.frame_id = 0
        self.high = track_high_thresh
        self.low = track_low_thresh
        self.new_thresh = new_track_thresh
        self.match_thresh = match_thresh
        self.max_lost = int(frame_rate / 30.0 * track_buffer)

    def update(self, dets: np.ndarray) -> np.ndarray:
        """dets: (N, 6) [x1, y1, x2, y2, conf, cls] for one frame.
        Returns (M, 8) [x1, y1, x2, y2, track_id, conf, cls, det_idx] where
        det_idx is the row of the input detection that produced/last-updated
        each track (side-channel re-index contract, reference track.py)."""
        self.frame_id += 1
        dets = np.asarray(dets, np.float64).reshape(-1, 6)
        all_idx = np.arange(len(dets))
        m_hi = dets[:, 4] >= self.high
        m_lo = (dets[:, 4] >= self.low) & ~m_hi
        hi, hi_idx = dets[m_hi], all_idx[m_hi]
        lo, lo_idx = dets[m_lo], all_idx[m_lo]
        mk = self.det_class
        d_hi = [mk(d[:4], d[4], d[5], det_idx=j) for d, j in zip(hi, hi_idx)]
        d_lo = [mk(d[:4], d[4], d[5], det_idx=j) for d, j in zip(lo, lo_idx)]

        pool = self.tracked + self.lost
        for t in pool:
            t.predict(self.kf)

        # stage 1: high-score association
        cost = iou_distance(np.array([t.kf_xyxy() for t in pool]).reshape(-1, 4),
                            np.array([d.xyxy for d in d_hi]).reshape(-1, 4))
        matches, u_track, u_det = linear_assignment(cost, self.match_thresh)
        activated: List[STrack] = []
        for ti, di in matches:
            t = pool[ti]
            if t.state == TRACKED:
                t.update(self.kf, d_hi[di], self.frame_id)
            else:
                t.re_activate(self.kf, d_hi[di], self.frame_id)
            activated.append(t)

        # stage 2: rescue with low-score detections (tracked-only)
        remain = [pool[i] for i in u_track if pool[i].state == TRACKED]
        cost2 = iou_distance(np.array([t.kf_xyxy() for t in remain]).reshape(-1, 4),
                             np.array([d.xyxy for d in d_lo]).reshape(-1, 4))
        matches2, u_track2, _ = linear_assignment(cost2, 0.5)
        for ti, di in matches2:
            remain[ti].update(self.kf, d_lo[di], self.frame_id)
            activated.append(remain[ti])
        for i in u_track2:
            remain[i].state = LOST

        # unmatched lost tracks stay lost; expire old ones
        for i in u_track:
            t = pool[i]
            if t.state == LOST and self.frame_id - t.frame_id > self.max_lost:
                t.state = REMOVED
            elif t.state == TRACKED and t not in activated and t not in remain:
                t.state = LOST

        # new tracks from unmatched high-score dets
        for di in u_det:
            d = d_hi[di]
            if d.score >= self.new_thresh:
                d.activate(self.kf, self.frame_id)
                activated.append(d)

        all_tracks = {t.track_id: t for t in activated}
        self.lost = [t for t in pool if t.state == LOST]
        self.tracked = list(all_tracks.values())

        out = [
            np.r_[t.kf_xyxy(), t.track_id, t.score, t.cls, t.det_idx]
            for t in self.tracked
            if t.state == TRACKED and t.frame_id == self.frame_id
        ]
        return np.asarray(out).reshape(-1, 8)
