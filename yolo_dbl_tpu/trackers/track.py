"""Tracker wiring for the predict stream (reference trackers/track.py).

`make_tracker` resolves a tracker config (yaml name, path, or dict) to a
constructed BYTETracker/BOTSORT; `update_result_with_tracks` applies one
frame's tracker output back onto a Results object (rows reordered to the
tracker's surviving detections, box data gaining the id column).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np

from .bot_sort import BOTSORT
from .byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}

_BYTE_KEYS = ("track_high_thresh", "track_low_thresh", "new_track_thresh",
              "match_thresh", "track_buffer")
_BOT_KEYS = ("proximity_thresh", "appearance_thresh", "with_reid")


def load_tracker_cfg(tracker: Union[str, Path, Dict]) -> Dict:
    """Resolve a tracker spec to its config dict. Names like 'bytetrack.yaml'
    resolve against the bundled cfg/trackers directory (reference
    check_yaml + cfg/trackers/*)."""
    if isinstance(tracker, dict):
        return dict(tracker)
    import yaml

    p = Path(tracker)
    if not p.is_file():
        bundled = Path(__file__).resolve().parent.parent / "cfg" / "trackers" / p.name
        if bundled.is_file():
            p = bundled
        else:
            raise FileNotFoundError(f"tracker config '{tracker}' not found")
    return yaml.safe_load(p.read_text())


def make_tracker(tracker: Union[str, Path, Dict] = "bytetrack.yaml", frame_rate: int = 30):
    """Build a tracker instance from its config (reference track.py:on_predict_start)."""
    cfg = load_tracker_cfg(tracker)
    ttype = cfg.get("tracker_type", "bytetrack")
    if ttype not in TRACKER_MAP:
        raise ValueError(f"only {sorted(TRACKER_MAP)} supported, got '{ttype}'")
    kwargs = {k: cfg[k] for k in _BYTE_KEYS if k in cfg}
    if ttype == "botsort":
        kwargs.update({k: cfg[k] for k in _BOT_KEYS if k in cfg})
    return TRACKER_MAP[ttype](frame_rate=frame_rate, **kwargs)


def reset_tracker(tracker) -> None:
    """Clear all track state (new video boundary, persist=False)."""
    tracker.tracked = []
    tracker.lost = []
    tracker.frame_id = 0


def update_result_with_tracks(result, tracker, frame: Optional[np.ndarray] = None):
    """Run one tracker step on a Results' boxes and write back id'd boxes.

    Mirrors reference track.py:on_predict_postprocess_end: tracker.update
    returns (M, 8) [x1, y1, x2, y2, id, conf, cls, det_idx]; surviving rows
    replace the Results boxes (order = tracker output), and side channels
    (masks/keypoints) are re-indexed by det_idx.
    """
    from ..engine.predictor import Boxes, Keypoints, Masks

    det = result.boxes.data if result.boxes is not None else np.zeros((0, 6))
    if len(det) == 0:
        return result
    if isinstance(tracker, BOTSORT):
        tracks = tracker.update(det[:, :6], frame)
    else:
        tracks = tracker.update(det[:, :6])
    if len(tracks) == 0:
        result.boxes = Boxes(np.zeros((0, 7)))
        if result.masks is not None:
            result.masks = Masks(result.masks.data[:0])
        if result.keypoints is not None:
            result.keypoints = Keypoints(result.keypoints.data[:0])
        return result
    idx = tracks[:, -1].astype(int)
    result.boxes = Boxes(tracks[:, :7])  # [x1,y1,x2,y2,id,conf,cls]
    if result.masks is not None:
        result.masks = Masks(result.masks.data[idx])
    if result.keypoints is not None:
        result.keypoints = Keypoints(result.keypoints.data[idx])
    return result
