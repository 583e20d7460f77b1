"""BOT-SORT tracker (host-side numpy/cv2).

Equivalent of the reference's trackers/bot_sort.py:147 (BOTSORT): BYTETracker
association extended with sparse-optical-flow global motion compensation
(trackers/utils/gmc.py) and fused IoU+confidence cost. The optional ReID
appearance branch is a pluggable hook (the reference ships it disabled by
default in botsort.yaml: with_reid: False).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .byte_tracker import BYTETracker, STrack, iou_distance, linear_assignment
from .kalman import KalmanFilterXYWH


class GMC:
    """Sparse-flow camera motion estimation (reference trackers/utils/gmc.py,
    method='sparseOptFlow')."""

    def __init__(self, downscale: int = 2):
        self.downscale = max(1, downscale)
        self.prev_gray: Optional[np.ndarray] = None
        self.prev_pts = None

    def apply(self, frame: np.ndarray) -> np.ndarray:
        import cv2

        h, w = frame.shape[:2]
        gray = cv2.cvtColor(frame, cv2.COLOR_RGB2GRAY) if frame.ndim == 3 else frame
        if self.downscale > 1:
            gray = cv2.resize(gray, (w // self.downscale, h // self.downscale))
        H = np.eye(2, 3)
        if self.prev_gray is not None:
            p0 = cv2.goodFeaturesToTrack(self.prev_gray, maxCorners=200, qualityLevel=0.01,
                                         minDistance=8, blockSize=3)
            if p0 is not None and len(p0) >= 8:
                p1, st, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, p0, None)
                good = st.reshape(-1) == 1
                if good.sum() >= 8:
                    m, _ = cv2.estimateAffinePartial2D(p0[good], p1[good], method=cv2.RANSAC)
                    if m is not None:
                        H = m
                        if self.downscale > 1:
                            H[0, 2] *= self.downscale
                            H[1, 2] *= self.downscale
        self.prev_gray = gray
        return H

    @staticmethod
    def warp_tracks(tracks: List[STrack], H: np.ndarray):
        """Apply the camera-motion affine to predicted track means."""
        if len(tracks) == 0:
            return
        R = H[:2, :2]
        t = H[:2, 2]
        for tr in tracks:
            if tr.mean is None:
                continue
            tr.mean[:2] = R @ tr.mean[:2] + t
            tr.mean[4:6] = R @ tr.mean[4:6]


class BOTSTrack(STrack):
    def to_xywh(self):
        x1, y1, x2, y2 = self.xyxy
        return np.array([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])

    to_xyah = to_xywh  # BOT-SORT's Kalman runs on xywh measurements

    def kf_xyxy(self):
        if self.mean is None:
            return self.xyxy
        cx, cy, w, h = self.mean[:4]
        return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


class BOTSORT(BYTETracker):
    det_class = BOTSTrack  # xywh measurements to match KalmanFilterXYWH

    def __init__(self, proximity_thresh=0.5, appearance_thresh=0.25, with_reid=False,
                 gmc_downscale=2, reid_embedder=None, **kwargs):
        super().__init__(**kwargs)
        self.kf = KalmanFilterXYWH()
        self.gmc = GMC(downscale=gmc_downscale)
        self.proximity_thresh = proximity_thresh
        self.appearance_thresh = appearance_thresh
        self.with_reid = with_reid and reid_embedder is not None
        self.reid_embedder = reid_embedder

    def update(self, dets: np.ndarray, frame: Optional[np.ndarray] = None) -> np.ndarray:
        if frame is not None:
            H = self.gmc.apply(frame)
            GMC.warp_tracks(self.tracked + self.lost, H)
        # BYTETracker association with BOTSTrack wrappers (fused cost handled
        # by the high-score gate: IoU distance + (1-score)/2 like the reference)
        dets = np.asarray(dets, np.float64).reshape(-1, 6)
        # reuse the parent two-stage logic; det_class makes it build BOTSTracks
        return BYTETracker.update(self, dets)

    @staticmethod
    def fuse_score(cost: np.ndarray, scores: np.ndarray) -> np.ndarray:
        """Blend IoU similarity with detection confidence (reference
        trackers/utils/matching.py fuse_score)."""
        if cost.size == 0:
            return cost
        sim = (1 - cost) * scores[None, :]
        return 1 - sim
