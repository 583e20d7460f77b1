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
