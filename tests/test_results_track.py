"""Results containers (Masks/Keypoints/Probs/OBB), task predictors, and
model.track() wiring (reference engine/results.py:938+, trackers/track.py)."""

import numpy as np
import pytest

from yolo_dbl_tpu.engine.predictor import OBB, Boxes, Keypoints, Masks, Probs, Results


def _boxes_results(track=False):
    data = np.array([[10.0, 10.0, 50.0, 60.0, 0.9, 0.0],
                     [70.0, 20.0, 110.0, 80.0, 0.7, 1.0]])
    if track:
        data = np.insert(data, 4, [3.0, 5.0], axis=1)
    img = np.full((120, 160, 3), 90, np.uint8)
    return Results(Boxes(data), orig_shape=(120, 160),
                   names={0: "cat", 1: "dog"}, orig_img=img)


def test_boxes_container_props():
    r = _boxes_results()
    assert r.boxes.xyxy.shape == (2, 4)
    assert r.boxes.xywh[0, 2] == pytest.approx(40.0)
    assert r.boxes.id is None
    rt = _boxes_results(track=True)
    assert rt.boxes.is_track and list(rt.boxes.id) == [3.0, 5.0]
    assert list(rt.boxes.cls) == [0.0, 1.0]
    assert rt.boxes.conf[0] == pytest.approx(0.9)


def test_results_verbose_json_txt_crop(tmp_path):
    r = _boxes_results(track=True)
    v = r.verbose()
    assert "cat" in v and "dog" in v
    js = r.to_json_dicts()
    assert js[0]["track_id"] == 3 and js[0]["name"] == "cat"
    p = r.save_txt(tmp_path / "labels.txt")
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 2 and lines[0].startswith("0 ")
    crops = r.save_crop(tmp_path / "crops")
    assert len(crops) == 2
    assert (tmp_path / "crops" / "cat").is_dir()
    canvas = r.plot()
    assert canvas.shape == (120, 160, 3)


def test_masks_container():
    m = np.zeros((2, 40, 40), bool)
    m[0, 5:15, 5:15] = True
    m[1, 20:30, 25:35] = True
    masks = Masks(m)
    polys = masks.xy
    assert len(polys) == 2 and polys[0].shape[1] == 2
    assert polys[0][:, 0].max() <= 15 and polys[0][:, 0].min() >= 4
    n = masks.xyn
    assert n[0].max() <= 1.0


def test_keypoints_probs_obb_containers():
    kp = Keypoints(np.array([[[10.0, 20.0, 0.9], [30.0, 40.0, 0.2]]]))
    assert kp.xy.shape == (1, 2, 2) and kp.conf.shape == (1, 2)

    probs = Probs(np.array([0.1, 0.6, 0.3]))
    assert probs.top1 == 1 and probs.top1conf == pytest.approx(0.6)
    assert probs.top5 == [1, 2, 0]

    # axis-aligned rbox (angle 0): corners reduce to the box corners
    obb = OBB(np.array([[50.0, 40.0, 20.0, 10.0, 0.0, 0.8, 0.0]]))
    pts = obb.xyxyxyxy[0]
    assert set(map(tuple, np.round(pts).astype(int))) == {
        (60, 45), (40, 45), (40, 35), (60, 35)}
    assert obb.xyxy[0] == pytest.approx([40.0, 35.0, 60.0, 45.0])
    r = Results(None, orig_shape=(120, 160), names={0: "plane"}, obb=obb,
                orig_img=np.zeros((120, 160, 3), np.uint8))
    assert "plane" in r.verbose()
    assert r.to_json_dicts()[0]["box"]["angle"] == 0.0
    assert r.plot().shape == (120, 160, 3)


@pytest.mark.slow
def test_task_predictors_end_to_end(tmp_path):
    """Each task model predicts through the facade and returns its typed
    container (reference task_map predictors)."""
    import jax

    from yolo_dbl_tpu.engine.model import YOLO

    img = np.full((96, 128, 3), 120, np.uint8)
    img[20:60, 30:90] = (220, 40, 40)

    for cfg, attr in [("yolov8n-seg.yaml", "masks"), ("yolov8n-pose.yaml", "keypoints"),
                      ("yolov8n-obb.yaml", "obb"), ("yolov8n-cls.yaml", "probs")]:
        y = YOLO(cfg, nc=3)
        res = y.predict(img, conf=0.001, imgsz=96)
        assert len(res) == 1
        r = res[0]
        assert getattr(r, attr) is not None or len(r) == 0, f"{cfg}: no {attr}"
        r.plot()
        r.to_json_dicts()


def test_tracker_yaml_configs_and_factory():
    from yolo_dbl_tpu.trackers.byte_tracker import BYTETracker
    from yolo_dbl_tpu.trackers.bot_sort import BOTSORT
    from yolo_dbl_tpu.trackers.track import load_tracker_cfg, make_tracker

    cfg = load_tracker_cfg("bytetrack.yaml")
    assert cfg["tracker_type"] == "bytetrack"
    t = make_tracker("bytetrack.yaml")
    assert isinstance(t, BYTETracker) and t.high == 0.25
    t2 = make_tracker("botsort.yaml")
    assert isinstance(t2, BOTSORT) and t2.proximity_thresh == 0.5
    with pytest.raises(FileNotFoundError):
        make_tracker("nosuch.yaml")


def test_update_result_with_tracks():
    from yolo_dbl_tpu.trackers.track import make_tracker, update_result_with_tracks

    tracker = make_tracker("bytetrack.yaml")
    # two well-separated, steady objects over 5 frames -> stable ids
    ids_seen = []
    for f in range(5):
        d = np.array([[10 + f, 10, 40 + f, 40, 0.9, 0.0],
                      [100, 60 + f, 140, 100 + f, 0.8, 1.0]])
        r = Results(Boxes(d), orig_shape=(160, 160), names={},
                    orig_img=np.zeros((160, 160, 3), np.uint8))
        r = update_result_with_tracks(r, tracker)
        if len(r.boxes):
            assert r.boxes.is_track
            ids_seen.append(tuple(sorted(r.boxes.id.astype(int))))
    assert len(ids_seen) >= 3
    assert len(set(ids_seen[1:])) == 1, f"track ids not stable: {ids_seen}"


@pytest.mark.slow
def test_model_track_facade(tmp_path):
    """YOLO.track over an image-sequence source yields id'd boxes with
    persist semantics (reference engine/model.py:694)."""
    from yolo_dbl_tpu.engine.model import YOLO

    y = YOLO("yolov8n.yaml", nc=2)
    frames = [np.full((96, 96, 3), 100, np.uint8) for _ in range(3)]
    for f in frames:
        f[20:70, 20:70] = (210, 60, 60)
    res = y.track(frames, conf=0.0001, imgsz=96, persist=True)
    assert len(res) == 3
    for r in res:
        assert r.boxes is None or r.boxes.data.shape[-1] == 7
    # persist keeps the same tracker instance across calls
    t1 = y._tracker
    y.track(frames[:1], conf=0.0001, imgsz=96, persist=True)
    assert y._tracker is t1
    y.track(frames[:1], conf=0.0001, imgsz=96, persist=False)
    assert y._tracker is not t1
