"""Multi-object trackers (reference trackers/: BYTETracker, BOTSORT)."""

from .bot_sort import BOTSORT, GMC
from .byte_tracker import BYTETracker, STrack
from .kalman import KalmanFilterXYAH, KalmanFilterXYWH

__all__ = ["BOTSORT", "GMC", "BYTETracker", "STrack", "KalmanFilterXYAH", "KalmanFilterXYWH"]
