"""Tracker tests: Kalman behavior, BYTETracker lifecycle, identity stability."""

import numpy as np

from yolo_dbl_tpu.trackers import BOTSORT, BYTETracker, KalmanFilterXYAH


def test_kalman_tracks_constant_velocity():
    kf = KalmanFilterXYAH()
    mean, cov = kf.initiate(np.array([10.0, 10.0, 1.0, 20.0]))
    for step in range(1, 6):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.array([10.0 + 2 * step, 10.0, 1.0, 20.0]))
    # learned velocity should be ~2 px/frame in x
    assert 1.0 < mean[4] < 3.0
    mean, cov = kf.predict(mean, cov)
    assert abs(mean[0] - (20.0 + mean[4])) < 1.5


def _det(x, y, s=0.9, cls=0, wh=20.0):
    return [x, y, x + wh, y + wh, s, cls]


def test_bytetracker_keeps_identity():
    t = BYTETracker(new_track_thresh=0.5)
    ids = []
    for i in range(5):
        out = t.update(np.array([_det(10 + 3 * i, 10)]))
        assert out.shape[0] == 1
        ids.append(int(out[0, 4]))
    assert len(set(ids)) == 1  # one stable identity


def test_bytetracker_two_objects_and_new_track():
    t = BYTETracker(new_track_thresh=0.5)
    out1 = t.update(np.array([_det(10, 10), _det(100, 100)]))
    assert out1.shape[0] == 2
    ids1 = set(out1[:, 4].astype(int))
    out2 = t.update(np.array([_det(12, 10), _det(102, 100), _det(200, 200)]))
    ids2 = set(out2[:, 4].astype(int))
    assert ids1 <= ids2 and len(ids2) == 3


def test_bytetracker_low_score_rescue():
    t = BYTETracker(track_high_thresh=0.5, track_low_thresh=0.1, new_track_thresh=0.5)
    out1 = t.update(np.array([_det(10, 10, 0.9)]))
    tid = int(out1[0, 4])
    # object dims to low confidence but overlaps the predicted position
    out2 = t.update(np.array([_det(12, 10, 0.3)]))
    assert out2.shape[0] == 1 and int(out2[0, 4]) == tid


def test_botsort_runs_with_frames():
    t = BOTSORT(new_track_thresh=0.5)
    frame = np.zeros((120, 120, 3), np.uint8)
    out = t.update(np.array([_det(10, 10)]), frame)
    assert out.shape[0] == 1
    out = t.update(np.array([_det(13, 10)]), frame)
    assert out.shape[0] == 1
