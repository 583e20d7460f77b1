"""Solution apps over tracked detections (host-side numpy).

Reference parity (solutions/): ObjectCounter (object_counter.py — line/region
in-out counting from track trajectories), Heatmap (heatmap.py — accumulated
presence map), SpeedEstimator (speed_estimation.py — px→unit speed from
track displacement). Each consumes per-frame (N, 6) detections and keeps a
BYTETracker inside, mirroring `model.track()`-driven reference apps.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..trackers import BYTETracker


def _side_of_line(pt, a, b) -> float:
    return (b[0] - a[0]) * (pt[1] - a[1]) - (b[1] - a[1]) * (pt[0] - a[0])


class ObjectCounter:
    """Count objects crossing a line (or entering a polygon region)."""

    def __init__(self, line: Optional[Sequence[Tuple[float, float]]] = None,
                 region: Optional[Sequence[Tuple[float, float]]] = None, **tracker_kw):
        assert (line is None) != (region is None), "provide exactly one of line/region"
        self.line = np.asarray(line, float) if line is not None else None
        self.region = np.asarray(region, float) if region is not None else None
        self.tracker = BYTETracker(**tracker_kw)
        self.in_count = 0
        self.out_count = 0
        self.counted: set = set()
        self._last_side: Dict[int, float] = {}

    def _in_region(self, pt) -> bool:
        # ray casting
        poly = self.region
        n = len(poly)
        inside = False
        j = n - 1
        for i in range(n):
            if (poly[i][1] > pt[1]) != (poly[j][1] > pt[1]):
                x_int = poly[j][0] + (pt[1] - poly[i][1]) / (poly[j][1] - poly[i][1] + 1e-12) * (
                    poly[i][0] - poly[j][0]
                )
                if pt[0] < x_int:
                    inside = not inside
            j = i
        return inside

    def update(self, dets: np.ndarray, frame: Optional[np.ndarray] = None) -> Dict:
        tracks = self.tracker.update(dets)
        for t in tracks:
            tid = int(t[4])
            cx, cy = (t[0] + t[2]) / 2, (t[1] + t[3]) / 2
            if self.line is not None:
                side = _side_of_line((cx, cy), self.line[0], self.line[1])
                prev = self._last_side.get(tid)
                if prev is not None and prev * side < 0 and tid not in self.counted:
                    if side > 0:
                        self.in_count += 1
                    else:
                        self.out_count += 1
                    self.counted.add(tid)
                self._last_side[tid] = side
            else:
                inside = self._in_region((cx, cy))
                prev = self._last_side.get(tid)
                if prev is not None and not prev and inside and tid not in self.counted:
                    self.in_count += 1
                    self.counted.add(tid)
                self._last_side[tid] = inside
        return {"in": self.in_count, "out": self.out_count, "tracks": tracks}


class Heatmap:
    """Accumulated presence heatmap (reference heatmap.py)."""

    def __init__(self, shape: Tuple[int, int], decay: float = 0.99, **tracker_kw):
        self.map = np.zeros(shape, np.float64)
        self.decay = decay
        self.tracker = BYTETracker(**tracker_kw)

    def update(self, dets: np.ndarray) -> np.ndarray:
        self.map *= self.decay
        tracks = self.tracker.update(dets)
        h, w = self.map.shape
        for t in tracks:
            x1, y1, x2, y2 = (int(np.clip(v, 0, lim - 1)) for v, lim in zip(t[:4], (w, h, w, h)))
            self.map[y1 : y2 + 1, x1 : x2 + 1] += 1.0
        return self.map

    def render(self) -> np.ndarray:
        import cv2

        norm = (255 * self.map / max(self.map.max(), 1e-9)).astype(np.uint8)
        return cv2.applyColorMap(norm, cv2.COLORMAP_JET)


class SpeedEstimator:
    """Per-track speed from center displacement (reference speed_estimation.py)."""

    def __init__(self, fps: float = 30.0, pixels_per_unit: float = 10.0, window: int = 5, **tracker_kw):
        self.fps = fps
        self.ppu = pixels_per_unit
        self.window = window
        self.tracker = BYTETracker(**tracker_kw)
        self.history: Dict[int, List[Tuple[float, float]]] = defaultdict(list)
        self.speeds: Dict[int, float] = {}

    def update(self, dets: np.ndarray) -> Dict[int, float]:
        tracks = self.tracker.update(dets)
        for t in tracks:
            tid = int(t[4])
            cx, cy = (t[0] + t[2]) / 2, (t[1] + t[3]) / 2
            hist = self.history[tid]
            hist.append((cx, cy))
            if len(hist) > self.window:
                hist.pop(0)
            if len(hist) >= 2:
                dist_px = float(np.hypot(hist[-1][0] - hist[0][0], hist[-1][1] - hist[0][1]))
                dt = (len(hist) - 1) / self.fps
                self.speeds[tid] = dist_px / self.ppu / max(dt, 1e-9)
        return dict(self.speeds)
