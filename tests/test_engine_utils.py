"""Engine/utils breadth tests: CLI, tuner, callbacks, settings, instance, plotting, exporter."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_dbl_tpu.cli import parse_kv
from yolo_dbl_tpu.engine.tuner import Tuner
from yolo_dbl_tpu.utils.callbacks import Callbacks, HOOKS, JSONLTracker
from yolo_dbl_tpu.utils.instance import Bboxes, Instances
from yolo_dbl_tpu.utils.plotting import Annotator, plot_images, plot_results
from yolo_dbl_tpu.utils.settings import SettingsManager


def test_parse_kv():
    kv = parse_kv(["epochs=5", "lr0=0.01", "model=x.yaml", "rect=True"])
    assert kv == {"epochs": 5, "lr0": 0.01, "model": "x.yaml", "rect": True}
    with pytest.raises(SystemExit):
        parse_kv(["noequals"])


def test_tuner_improves(tmp_path):
    """Fitness = -Σ(h - target)² over two keys: the evolver should approach it."""
    target = {"lr0": 0.02, "momentum": 0.9}

    def train_fn(hyp):
        return -sum((hyp[k] - v) ** 2 for k, v in target.items())

    t = Tuner(train_fn, space={"lr0": (1e-4, 0.1, 1.0), "momentum": (0.7, 0.98, 0.3)},
              save_dir=str(tmp_path), seed=0)
    best, fit = t(iterations=30, initial={"lr0": 0.09, "momentum": 0.75})
    assert fit > train_fn({"lr0": 0.09, "momentum": 0.75})
    assert (tmp_path / "tune_results.csv").exists()


def test_callbacks_fire(tmp_path):
    cb = Callbacks()
    seen = []
    cb.add("on_train_epoch_end", lambda **kw: seen.append(kw))
    cb.run("on_train_epoch_end", metrics={"loss": 1.0})
    assert seen and seen[0]["metrics"]["loss"] == 1.0
    with pytest.raises(KeyError):
        cb.add("not_a_hook", lambda: None)
    cb.integrate("jsonl", path=str(tmp_path / "m.jsonl"))
    cb.run("on_fit_epoch_end", metrics={"mAP50": 0.5})
    assert (tmp_path / "m.jsonl").exists()
    assert len(HOOKS) >= 22


def test_settings_roundtrip(tmp_path):
    s = SettingsManager(path=str(tmp_path / "s.json"))
    s["runs_dir"] = "custom"
    s.save()
    s2 = SettingsManager(path=str(tmp_path / "s.json"))
    assert s2["runs_dir"] == "custom"
    s2.reset()
    assert s2["runs_dir"] == "runs"


def test_bboxes_convert_and_ops():
    b = Bboxes(np.array([[10, 10, 30, 50]]), "xyxy")
    assert b.areas()[0] == 800
    b.convert("xywh")
    np.testing.assert_allclose(b.bboxes[0], [20, 30, 20, 40])
    b.convert("ltwh")
    np.testing.assert_allclose(b.bboxes[0], [10, 10, 20, 40])
    b.convert("xyxy")
    np.testing.assert_allclose(b.bboxes[0], [10, 10, 30, 50])


def test_instances_flip_and_clip():
    inst = Instances(np.array([[10.0, 10.0, 30.0, 50.0]]), bbox_format="xyxy")
    inst.fliplr(100)
    np.testing.assert_allclose(inst.bboxes[0], [70, 10, 90, 50])
    inst.flipud(100)
    np.testing.assert_allclose(inst.bboxes[0], [70, 50, 90, 90])
    inst.scale(2, 1)
    inst.clip(150, 100)
    np.testing.assert_allclose(inst.bboxes[0], [140, 50, 150, 90])


def test_plotting(tmp_path):
    imgs = np.zeros((2, 64, 64, 3), np.float32)
    boxes = [np.array([[5, 5, 30, 30]]), np.array([[10, 10, 40, 40]])]
    cls = [np.array([0]), np.array([1])]
    canvas = plot_images(imgs, boxes, cls, save_path=str(tmp_path / "mosaic.png"))
    assert canvas.shape[0] >= 64 and (tmp_path / "mosaic.png").exists()
    hist = [{"loss": 3.0, "mAP50": 0.1}, {"loss": 2.0, "mAP50": 0.3}]
    plot_results(hist, save_path=str(tmp_path / "curves.png"))
    assert (tmp_path / "curves.png").exists()


@pytest.mark.compileheavy
def test_exporter_stablehlo_roundtrip(tmp_path):
    from yolo_dbl_tpu.engine.exporter import Exporter, load_stablehlo
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov13n_DBL.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    ex = Exporter(m, v, imgsz=64)
    path = ex("stablehlo", str(tmp_path / "model.stablehlo"))
    assert path.exists() and path.stat().st_size > 1000
    fn = load_stablehlo(path)
    out = fn(jnp.zeros((1, 64, 64, 3)))
    ref = m.predict(v, jnp.zeros((1, 64, 64, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.compileheavy
def test_exporter_deploy_roundtrip(tmp_path):
    from yolo_dbl_tpu.engine.exporter import Exporter
    from yolo_dbl_tpu.engine.model import YOLO
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov13n_DBL.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    ex = Exporter(m, v, imgsz=64)
    path = ex("deploy", str(tmp_path / "best.ckpt"))
    y = YOLO(str(path))
    assert y.nc == 3
    out = y.model.predict(y.variables, jnp.zeros((1, 64, 64, 3)))
    ref = m.predict(v, jnp.zeros((1, 64, 64, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
