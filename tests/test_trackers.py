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


def test_bytetracker_det_idx_side_channel_alignment():
    """Output col 7 must be the ORIGINATING detection row index, not the
    track-list position, so masks/keypoints re-indexed by it stay aligned
    (reference track.py on_predict_postprocess_end contract)."""
    t = BYTETracker(new_track_thresh=0.5)
    t.update(np.array([_det(10, 10), _det(100, 100)]))
    # swap detection order on frame 2: track near (100,100) now comes FIRST
    out = t.update(np.array([_det(102, 100), _det(12, 10)]))
    assert out.shape[0] == 2
    for row in out:
        di = int(row[7])
        if row[0] > 60:      # the (100,100) track → input row 0
            assert di == 0
        else:                # the (10,10) track → input row 1
            assert di == 1


def test_botsort_uses_xywh_measurements():
    """BOTSORT builds BOTSTrack dets (xywh Kalman measurements), not plain
    STracks whose to_xyah aspect-ratio form would corrupt KalmanFilterXYWH."""
    from yolo_dbl_tpu.trackers.bot_sort import BOTSTrack

    t = BOTSORT(new_track_thresh=0.5)
    t.update(np.array([_det(10, 10)]), None)
    assert all(isinstance(tr, BOTSTrack) for tr in t.tracked)
    # a tall box (w != h) keeps its width under the xywh filter
    t2 = BOTSORT(new_track_thresh=0.5)
    d = np.array([[10.0, 10.0, 30.0, 90.0, 0.9, 0.0]])
    t2.update(d, None)
    out = t2.update(d, None)
    w = out[0, 2] - out[0, 0]
    assert abs(w - 20.0) < 2.0
