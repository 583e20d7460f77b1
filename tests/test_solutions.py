"""Solutions apps tests over synthetic trajectories."""

import numpy as np

from yolo_dbl_tpu.solutions import Heatmap, ObjectCounter, SpeedEstimator


def _moving_det(x, y, s=0.9):
    return np.array([[x, y, x + 20, y + 20, s, 0]])


def test_object_counter_line_crossing():
    counter = ObjectCounter(line=[(50, 0), (50, 200)], new_track_thresh=0.5)
    for x in range(20, 90, 5):  # crosses x=50 left→right
        out = counter.update(_moving_det(x, 40))
    assert out["in"] + out["out"] == 1


def test_object_counter_region_entry():
    counter = ObjectCounter(region=[(60, 0), (120, 0), (120, 120), (60, 120)], new_track_thresh=0.5)
    for x in range(10, 100, 6):
        out = counter.update(_moving_det(x, 30))
    assert out["in"] == 1


def test_heatmap_accumulates():
    hm = Heatmap((100, 100), new_track_thresh=0.5)
    for _ in range(5):
        m = hm.update(_moving_det(40, 40))
    assert m[50, 50] > 0
    assert m[5, 5] == 0
    assert hm.render().shape == (100, 100, 3)


def test_speed_estimator():
    se = SpeedEstimator(fps=10, pixels_per_unit=1.0, new_track_thresh=0.5)
    speeds = {}
    for i in range(8):
        speeds = se.update(_moving_det(10 + 10 * i, 40))
    assert speeds and abs(list(speeds.values())[0] - 100.0) < 20  # ~10px/frame * 10fps


# ---------------------------------------------------------------- apps2 suite
from yolo_dbl_tpu.solutions import (  # noqa: E402
    AIGym,
    Analytics,
    DistanceCalculation,
    ParkingManagement,
    QueueManager,
    RegionCounter,
    SecurityAlarm,
    TrackZone,
    estimate_pose_angle,
)


def _pose(angle_deg):
    """Elbow kpts (shoulder, elbow, wrist) at a given elbow angle."""
    import math

    b = np.array([50.0, 50.0])
    a = b + [0.0, -30.0]  # shoulder straight up
    rad = math.radians(angle_deg)
    c = b + 30.0 * np.array([math.sin(rad), -math.cos(rad)])
    k = np.zeros((17, 3))
    k[6], k[8], k[10] = [*a, 1], [*b, 1], [*c, 1]
    return k[None]  # one person


def test_pose_angle():
    assert abs(estimate_pose_angle((0, -1), (0, 0), (0, -1)) - 0) < 1e-6
    assert abs(estimate_pose_angle((0, -1), (0, 0), (1, 0)) - 90) < 1e-6
    assert abs(estimate_pose_angle((0, -1), (0, 0), (0, 1)) - 180) < 1e-6


def test_aigym_counts_reps():
    gym = AIGym(kpts=(6, 8, 10), up_angle=145, down_angle=90)
    for ang in [170, 160, 80, 70, 160, 170, 75, 165]:  # two up→down transitions
        out = gym.update(_pose(ang))
    assert out["count"][0] == 2
    assert out["stage"][0] == "up"


def test_queue_manager():
    qm = QueueManager(region=[(0, 0), (100, 0), (100, 100), (0, 100)], new_track_thresh=0.5)
    dets = np.array([[10, 10, 30, 30, 0.9, 0], [200, 200, 220, 220, 0.9, 0]])
    for _ in range(3):
        out = qm.update(dets)
    assert out["queue_count"] == 1


def test_region_counter():
    rc = RegionCounter(new_track_thresh=0.5)
    rc.add_region("left", [(0, 0), (50, 0), (50, 100), (0, 100)])
    rc.add_region("right", [(50, 0), (100, 0), (100, 100), (50, 100)])
    dets = np.array([[10, 40, 30, 60, 0.9, 0], [60, 40, 80, 60, 0.9, 0], [70, 10, 90, 30, 0.9, 0]])
    for _ in range(3):
        counts = rc.count(dets)
    assert counts == {"left": 1, "right": 2}


def test_distance_calculation():
    dc = DistanceCalculation(new_track_thresh=0.5)
    dets = np.array([[0, 0, 20, 20, 0.9, 0], [30, 40, 50, 60, 0.9, 0]])
    out = dc.calculate(dets)
    ids = sorted(out["centers"])
    dc.select(ids[0])
    dc.select(ids[1])
    out = dc.calculate(dets)
    assert abs(out["distance"] - 50.0) < 1e-6  # centers (10,10) vs (40,50)


def test_trackzone_drops_outside():
    tz = TrackZone(region=[(0, 0), (100, 0), (100, 100), (0, 100)], new_track_thresh=0.5)
    dets = np.array([[10, 10, 30, 30, 0.9, 0], [200, 200, 220, 220, 0.9, 0]])
    for _ in range(3):
        tracks = tz.update(dets)
    assert len(tracks) == 1
    cx = (tracks[0][0] + tracks[0][2]) / 2
    assert cx < 100


def test_security_alarm_latch():
    fired = []
    sa = SecurityAlarm(records=2, notifier=fired.append, new_track_thresh=0.5)
    two = np.array([[0, 0, 20, 20, 0.9, 0], [50, 50, 70, 70, 0.9, 0]])
    one = two[:1]
    sa.monitor(two)
    sa.monitor(two)  # latched: no second alert
    assert len(fired) == 1
    sa.monitor(one)  # resets latch
    out = sa.monitor(two)
    assert out["triggered"] and len(fired) == 2


def test_parking_management():
    slots = [
        {"points": [(0, 0), (40, 0), (40, 40), (0, 40)]},
        {"points": [(50, 0), (90, 0), (90, 40), (50, 40)]},
    ]
    pm = ParkingManagement(slots)
    out = pm.process_data(np.array([[5, 5, 35, 35, 0.9, 0]]))
    assert out == {"occupied": 1, "available": 1, "slots": [True, False]}


def test_analytics_counts_and_render():
    an = Analytics(names={0: "person", 1: "car"})
    an.process_data(np.array([[0, 0, 10, 10, 0.9, 0], [20, 20, 30, 30, 0.9, 1]]), 0)
    counts = an.process_data(np.array([[0, 0, 10, 10, 0.9, 0]]), 1)
    assert counts == {"person": 1}
    for plot in ("line", "bar", "pie", "area"):
        img = an.render(plot)
        assert img.ndim == 3 and img.shape[2] == 3
