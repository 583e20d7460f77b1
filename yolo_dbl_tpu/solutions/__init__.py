"""Vision solutions — tracker-backed demo applications.

Equivalent of the reference's solutions/ package (2,006 LoC, 14 apps built
on model.track results). The three headline apps are implemented here over
this framework's BYTETracker; the remaining reference apps (queue manager,
parking, workout counting, ...) are thin variations of the same
region/trajectory machinery.
"""

from .apps import Heatmap, ObjectCounter, SpeedEstimator

__all__ = ["Heatmap", "ObjectCounter", "SpeedEstimator"]
