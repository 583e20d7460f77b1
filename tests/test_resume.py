"""Training resume (VERDICT r2 #2; reference check_resume/resume_training,
engine/trainer.py:692,724): facade train(resume=True) restores
{params, opt_state, EMA, epoch, best_fitness} from last.ckpt and continues
the schedule — an interrupted 2+3-epoch run must match an uninterrupted
5-epoch run bitwise (params, EMA, opt step count, shuffle stream).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from yolo_dbl_tpu.engine.model import YOLO  # noqa: E402

from .fixtures import make_shapes_dataset  # noqa: E402

# lrf=1.0 → constant LR after warmup: the decay horizon depends on the
# launch-time `epochs`, and this test EMULATES interruption by launching the
# first leg with epochs=2 (a real resume relaunches with the same total, so
# its schedule matches by construction — train_args are restored from ckpt)
COMMON = dict(
    batch=4, imgsz=64, lr0=0.005, lrf=1.0, warmup_epochs=1.0,
    mosaic=0.0, mixup=0.0, copy_paste=0.0, translate=0.0, scale=0.0,
    fliplr=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, erasing=0.0,
    close_mosaic=0, multi_scale=False, patience=100, workers=0,
)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path):
    data = make_shapes_dataset(tmp_path / "ds", n_train=8, n_val=4, imgsz=64)

    # uninterrupted 5-epoch run
    m_full = YOLO("yolov8n.yaml", nc=3)
    m_full.train(data, epochs=5, project=str(tmp_path / "runs"), name="full", **COMMON)
    full_state = m_full.trainer.state

    # 2 epochs, then resume from disk for the remaining 3
    m_a = YOLO("yolov8n.yaml", nc=3)
    m_a.train(data, epochs=2, project=str(tmp_path / "runs"), name="split", **COMMON)
    m_b = YOLO("yolov8n.yaml", nc=3)
    out = m_b.train(data, epochs=5, resume=True,
                    project=str(tmp_path / "runs"), name="split", **COMMON)
    split_state = m_b.trainer.state

    # resume continued at epoch 2 → history covers epochs 2..4 only
    assert [h["epoch"] for h in out["history"]] == [2, 3, 4]
    assert int(split_state.step) == int(full_state.step)

    for name, tree_a, tree_b in (
        ("params", full_state.params, split_state.params),
        ("ema", full_state.ema_params, split_state.ema_params),
        ("batch_stats", full_state.batch_stats, split_state.batch_stats),
    ):
        for a, b in zip(_leaves(tree_a), _leaves(tree_b)):
            np.testing.assert_array_equal(a, b, err_msg=f"{name} diverged after resume")


@pytest.mark.slow
def test_resume_restores_train_args(tmp_path):
    """A bare resume=True must reconstruct the ORIGINAL run's args (imgsz,
    batch, lr0, epochs) from the checkpoint before the loaders/optimizer are
    built — not train on defaults (reference check_resume re-applies ckpt
    args). Regression test for the round-3 review finding where the merge
    happened after Trainer construction."""
    data = make_shapes_dataset(tmp_path / "ds", n_train=8, n_val=4, imgsz=64)
    m_a = YOLO("yolov8n.yaml", nc=3)
    m_a.train(data, epochs=1, project=str(tmp_path / "runs"), name="args", **COMMON)

    m_b = YOLO("yolov8n.yaml", nc=3)
    out = m_b.train(data, resume=True, project=str(tmp_path / "runs"), name="args")
    # original epochs=1 already complete... epochs restored as 1 → no new
    # epochs run; explicit override should extend
    assert out["history"] == []
    m_c = YOLO("yolov8n.yaml", nc=3)
    out = m_c.train(data, resume=True, epochs=2, project=str(tmp_path / "runs"), name="args")
    assert [h["epoch"] for h in out["history"]] == [1]
    # the loaders/optimizer were built from the RESTORED args, not defaults
    assert m_c.trainer.cfg.imgsz == COMMON["imgsz"]
    assert m_c.trainer.cfg.batch == COMMON["batch"]
    assert float(m_c.trainer.cfg.lr0) == COMMON["lr0"]
    # and the re-saved checkpoint carries the full effective cfg forward
    from yolo_dbl_tpu.utils.checkpoint import peek_checkpoint_meta

    ta = peek_checkpoint_meta(tmp_path / "runs" / "args" / "last.ckpt")["train_args"]
    assert ta["imgsz"] == COMMON["imgsz"] and ta["batch"] == COMMON["batch"]
    assert ta["epochs"] == 2 and "resume" not in ta


@pytest.mark.slow
def test_resume_missing_ckpt_raises(tmp_path):
    data = make_shapes_dataset(tmp_path / "ds", n_train=4, n_val=4, imgsz=64)
    m = YOLO("yolov8n.yaml", nc=3)
    with pytest.raises(FileNotFoundError):
        m.train(data, epochs=1, resume=True,
                project=str(tmp_path / "runs"), name="nonexistent", **COMMON)
