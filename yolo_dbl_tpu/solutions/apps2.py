"""Remaining solutions apps (reference solutions/, 14-app catalogue).

Host-side numpy apps over per-frame detections/keypoints, matching the
behavior of the reference classes:

- AIGym (ai_gym.py:7) — pose-angle rep counting with up/down stages
- QueueManager (queue_management.py:7) — live in-region queue size
- RegionCounter (region_counter.py:8) — per-named-region live counts
- DistanceCalculation (distance_calculation.py:11) — centroid distance
  between two selected track ids
- TrackZone (trackzone.py:10) — tracking restricted to a polygon zone
- SecurityAlarm (security_alarm.py:8) — threshold alert with a pluggable
  notifier (the reference emails via SMTP; we invoke a callback)
- ParkingManagement (parking_management.py:161) — slot occupancy from
  detections vs annotated slot polygons
- Analytics (analytics.py:14) — per-frame class-count tracking with
  line/bar/pie/area chart rendering

Each app consumes (N, 6) [x1,y1,x2,y2,conf,cls] detections (AIGym consumes
keypoints) and keeps a BYTETracker, mirroring the reference's
model.track()-driven loop. GUI/SMTP surfaces (tkinter point selection,
email) are replaced with programmatic APIs — the compute behavior is the
parity target.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..trackers import BYTETracker


def point_in_polygon(pt, poly) -> bool:
    """Ray-casting test (shared by region apps)."""
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


def estimate_pose_angle(a, b, c) -> float:
    """Angle at b (degrees, 0-180) formed by points a-b-c (reference
    plotting.py Annotator.estimate_pose_angle)."""
    a, b, c = (np.asarray(p, float)[:2] for p in (a, b, c))
    ang = np.degrees(np.arctan2(c[1] - b[1], c[0] - b[0]) - np.arctan2(a[1] - b[1], a[0] - b[0]))
    ang = abs(ang)
    return 360.0 - ang if ang > 180.0 else float(ang)


class AIGym:
    """Workout rep counting from pose keypoints (reference ai_gym.py:7).

    update() takes per-frame keypoints (P, K, 2|3) for P persons; tracks
    angle of the kpts triple per person, counts a rep on each up→down
    transition.
    """

    def __init__(self, kpts: Sequence[int] = (6, 8, 10), up_angle: float = 145.0,
                 down_angle: float = 90.0):
        self.kpts = tuple(kpts)
        self.up_angle = float(up_angle)
        self.down_angle = float(down_angle)
        self.count: List[int] = []
        self.angle: List[float] = []
        self.stage: List[str] = []

    def update(self, keypoints: np.ndarray) -> Dict:
        kps = np.asarray(keypoints, float)
        if kps.ndim == 2:
            kps = kps[None]
        while len(self.count) < len(kps):
            self.count.append(0)
            self.angle.append(0.0)
            self.stage.append("-")
        for ind, k in enumerate(kps):
            a, b, c = (k[i] for i in self.kpts)
            ang = estimate_pose_angle(a, b, c)
            self.angle[ind] = ang
            if ang < self.down_angle:
                if self.stage[ind] == "up":
                    self.count[ind] += 1
                self.stage[ind] = "down"
            elif ang > self.up_angle:
                self.stage[ind] = "up"
        return {"count": list(self.count), "angle": list(self.angle), "stage": list(self.stage)}


class QueueManager:
    """Live queue size inside a region (reference queue_management.py:7):
    counts current tracks whose center lies in the polygon."""

    def __init__(self, region: Sequence[Tuple[float, float]], **tracker_kw):
        self.region = np.asarray(region, float)
        self.tracker = BYTETracker(**tracker_kw)
        self.queue_count = 0

    def update(self, dets: np.ndarray) -> Dict:
        tracks = self.tracker.update(dets)
        self.queue_count = 0
        inside_ids = []
        for t in tracks:
            cx, cy = (t[0] + t[2]) / 2, (t[1] + t[3]) / 2
            if point_in_polygon((cx, cy), self.region):
                self.queue_count += 1
                inside_ids.append(int(t[4]))
        return {"queue_count": self.queue_count, "ids": inside_ids, "tracks": tracks}


class RegionCounter:
    """Simultaneous live counts in multiple named regions (reference
    region_counter.py:8)."""

    def __init__(self, **tracker_kw):
        self.regions: Dict[str, np.ndarray] = {}
        self.tracker = BYTETracker(**tracker_kw)

    def add_region(self, name: str, polygon_points: Sequence[Tuple[float, float]],
                   region_color=None, text_color=None):
        self.regions[name] = np.asarray(polygon_points, float)

    def count(self, dets: np.ndarray) -> Dict[str, int]:
        tracks = self.tracker.update(dets)
        counts = {name: 0 for name in self.regions}
        for t in tracks:
            cx, cy = (t[0] + t[2]) / 2, (t[1] + t[3]) / 2
            for name, poly in self.regions.items():
                if point_in_polygon((cx, cy), poly):
                    counts[name] += 1
        return counts


class DistanceCalculation:
    """Centroid distance between two selected tracks (reference
    distance_calculation.py:11). select() replaces the reference's mouse
    callback; calculate() returns pixel distance when both ids are live."""

    def __init__(self, **tracker_kw):
        self.tracker = BYTETracker(**tracker_kw)
        self.selected: List[int] = []

    def select(self, track_id: int):
        if track_id in self.selected:
            self.selected.remove(track_id)
        elif len(self.selected) < 2:
            self.selected.append(int(track_id))

    def calculate(self, dets: np.ndarray) -> Dict:
        tracks = self.tracker.update(dets)
        centers = {int(t[4]): ((t[0] + t[2]) / 2, (t[1] + t[3]) / 2) for t in tracks}
        dist = None
        if len(self.selected) == 2 and all(i in centers for i in self.selected):
            (x1, y1), (x2, y2) = (centers[i] for i in self.selected)
            dist = float(np.hypot(x2 - x1, y2 - y1))
        return {"distance": dist, "tracks": tracks, "centers": centers}


class TrackZone:
    """Track only objects inside a polygon zone (reference trackzone.py:10):
    detections outside the zone are dropped before the tracker sees them —
    ids are only ever assigned inside the zone."""

    def __init__(self, region: Sequence[Tuple[float, float]], **tracker_kw):
        self.region = np.asarray(region, float)
        self.tracker = BYTETracker(**tracker_kw)

    def update(self, dets: np.ndarray) -> np.ndarray:
        dets = np.asarray(dets, float).reshape(-1, 6)
        keep = [
            i for i, d in enumerate(dets)
            if point_in_polygon(((d[0] + d[2]) / 2, (d[1] + d[3]) / 2), self.region)
        ]
        return self.tracker.update(dets[keep] if keep else np.zeros((0, 6)))


class SecurityAlarm:
    """Alert when detections exceed a threshold (reference
    security_alarm.py:8). The reference emails a snapshot over SMTP; here a
    pluggable `notifier(n_detections)` callback fires once per breach
    episode (reference's email_sent latch)."""

    def __init__(self, records: int = 5, notifier: Optional[Callable[[int], None]] = None,
                 **tracker_kw):
        self.records = int(records)
        self.notifier = notifier
        self.alert_sent = False
        self.alerts: List[int] = []
        self.tracker = BYTETracker(**tracker_kw)

    def monitor(self, dets: np.ndarray) -> Dict:
        tracks = self.tracker.update(dets)
        n = len(tracks)
        triggered = False
        if n >= self.records and not self.alert_sent:
            self.alert_sent = True
            triggered = True
            self.alerts.append(n)
            if self.notifier is not None:
                self.notifier(n)
        elif n < self.records:
            self.alert_sent = False
        return {"n": n, "triggered": triggered, "tracks": tracks}


class ParkingManagement:
    """Parking slot occupancy (reference parking_management.py:161): a slot
    is occupied when any detection center lies inside its polygon. Slots are
    provided as a list of {'points': [...]} dicts (the reference reads the
    same structure from the Tkinter selector's JSON)."""

    def __init__(self, slots: Sequence[Dict]):
        self.slots = [np.asarray(s["points"], float) for s in slots]
        self.occupied = 0
        self.available = len(self.slots)

    def process_data(self, dets: np.ndarray) -> Dict:
        dets = np.asarray(dets, float).reshape(-1, 6)
        centers = [((d[0] + d[2]) / 2, (d[1] + d[3]) / 2) for d in dets]
        occ = []
        for poly in self.slots:
            occ.append(any(point_in_polygon(c, poly) for c in centers))
        self.occupied = int(sum(occ))
        self.available = len(self.slots) - self.occupied
        return {"occupied": self.occupied, "available": self.available, "slots": occ}


class Analytics:
    """Per-frame class-count analytics with chart rendering (reference
    analytics.py:14): accumulates {class: count} per frame; render() draws
    line/bar/pie/area charts via matplotlib (Agg)."""

    def __init__(self, names: Optional[Dict[int, str]] = None):
        self.names = names or {}
        self.frames: List[int] = []
        self.history: List[Dict[str, int]] = []
        self.clswise_count: Dict[str, int] = {}

    def process_data(self, dets: np.ndarray, frame_number: int) -> Dict[str, int]:
        dets = np.asarray(dets, float).reshape(-1, 6)
        counts: Dict[str, int] = defaultdict(int)
        for d in dets:
            cls = int(d[5])
            counts[self.names.get(cls, str(cls))] += 1
        self.clswise_count = dict(counts)
        self.frames.append(int(frame_number))
        self.history.append(dict(counts))
        return self.clswise_count

    def render(self, plot: str = "line"):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        keys = sorted({k for h in self.history for k in h})
        if plot in ("line", "area"):
            series = {k: [h.get(k, 0) for h in self.history] for k in keys}
            if plot == "area" and keys:
                ax.stackplot(self.frames, *[series[k] for k in keys], labels=keys)
            else:
                for k in keys:
                    ax.plot(self.frames, series[k], label=k)
            ax.set_xlabel("frame")
            ax.set_ylabel("count")
            if keys:
                ax.legend()
        elif plot == "bar":
            ax.bar(list(self.clswise_count), list(self.clswise_count.values()))
        elif plot == "pie":
            if self.clswise_count:
                ax.pie(list(self.clswise_count.values()), labels=list(self.clswise_count))
        else:
            raise ValueError(f"unknown plot type {plot!r}")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return buf
