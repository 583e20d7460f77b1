"""Vision solutions — tracker-backed demo applications.

Equivalent of the reference's solutions/ package (2,006 LoC, 14 apps built
on model.track results): ObjectCounter/Heatmap/SpeedEstimator in apps.py;
AIGym, QueueManager, RegionCounter, DistanceCalculation, TrackZone,
SecurityAlarm, ParkingManagement and Analytics in apps2.py. The reference's
ParkingPtsSelection (Tkinter UI) and streamlit_inference (streamlit webapp)
are GUI shells with no compute; their programmatic cores (slot polygons in,
occupancy out; stream predict loop) are covered by ParkingManagement and the
predictor engine.
"""

from .apps import Heatmap, ObjectCounter, SpeedEstimator
from .apps2 import (
    AIGym,
    Analytics,
    DistanceCalculation,
    ParkingManagement,
    QueueManager,
    RegionCounter,
    SecurityAlarm,
    TrackZone,
    estimate_pose_angle,
    point_in_polygon,
)

__all__ = [
    "AIGym",
    "Analytics",
    "DistanceCalculation",
    "Heatmap",
    "ObjectCounter",
    "ParkingManagement",
    "QueueManager",
    "RegionCounter",
    "SecurityAlarm",
    "SpeedEstimator",
    "TrackZone",
    "estimate_pose_angle",
    "point_in_polygon",
]
