"""Elastic training supervisor (utils/elastic.py): a child killed mid-run
(hard os._exit, no teardown — emulating a TPU preemption / OOM kill) is
relaunched and resumes from last.ckpt; the finished run has trained every
epoch. Complements tests/test_resume.py, which pins that the resume path
itself is bitwise-exact (reference has only the manual flag —
engine/trainer.py:692 check_resume)."""

import json
from pathlib import Path

import pytest

jax = pytest.importorskip("jax")

from yolo_dbl_tpu.utils.elastic import elastic_train  # noqa: E402

from .fixtures import make_shapes_dataset  # noqa: E402

FAST = dict(
    batch=4, imgsz=64, lr0=0.005, lrf=1.0, warmup_epochs=1.0,
    mosaic=0.0, mixup=0.0, copy_paste=0.0, translate=0.0, scale=0.0,
    fliplr=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, erasing=0.0,
    close_mosaic=0, multi_scale=False, patience=100, workers=0,
)


@pytest.mark.slow
def test_elastic_survives_preemption(tmp_path):
    data = make_shapes_dataset(tmp_path / "ds", n_train=8, n_val=4, imgsz=64)
    out = elastic_train(
        "yolov8n.yaml", data, nc=3, epochs=3, max_restarts=2, backoff_s=0.1,
        project=str(tmp_path / "runs"), name="elastic",
        _crash_after_epoch=1, **FAST)

    # the injector killed attempt 1 after epoch 1; attempt 2 resumed
    assert out["restarts"] == 1
    run_dir = Path(out["run_dir"])
    assert (run_dir / "elastic_crash_done").exists()

    # the relaunch spec asked for resume (a checkpoint existed by then)
    spec = json.loads((run_dir / "elastic_spec.json").read_text())
    assert spec["train"].get("resume") is True

    # final checkpoint covers the full schedule
    from yolo_dbl_tpu.utils.checkpoint import peek_checkpoint_meta

    meta = peek_checkpoint_meta(run_dir / "last.ckpt")
    assert meta["epoch"] == 2  # 0-indexed, epochs=3
    assert meta["train_args"]["epochs"] == 3


def test_elastic_gives_up_after_max_restarts(tmp_path):
    """A child that dies before any checkpoint exists exhausts its retries
    and surfaces the failure instead of looping forever."""
    with pytest.raises(RuntimeError, match="giving up"):
        elastic_train(
            "nonexistent_model_config.yaml", tmp_path / "nope", nc=3,
            epochs=1, max_restarts=1, backoff_s=0.05,
            project=str(tmp_path / "runs"), name="doomed")
