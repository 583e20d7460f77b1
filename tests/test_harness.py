"""Classical-harness tests: Trainer loop, EarlyStopping, tools, analyze, features."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from yolo_dbl_tpu.harness import (
    EarlyStopping,
    Trainer,
    default_val,
    find_new_dir,
    numeric_sort,
    plt_coco_stats,
    read_coco_stats,
    replot_conf_matrix,
)
from yolo_dbl_tpu.harness.features import extract_features, find_plot_size


class _ToyDetector:
    """Minimal adapter: a conv 'detector' predicting one centered box whose
    score rises as a learnable scalar trains toward 1."""

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            s = self.param("s", nn.initializers.constant(-2.0), ())
            y = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)], name="conv")(x)
            y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
            return nn.sigmoid(s), y

    def __init__(self):
        self.net = self.Net()

    def init(self, rng):
        return self.net.init(rng, jnp.zeros((1, 16, 16, 3)))

    def loss(self, variables, batch, rng, train=True, mutable=None):
        out, aux = self.net.apply(variables, batch["img"], train=train, mutable=mutable or [])
        score, _ = out
        total = (1.0 - score) ** 2
        return total, {"score": score}, aux

    def predict(self, variables, img):
        score, _ = self.net.apply(variables, img)
        b = img.shape[0]
        det = jnp.tile(jnp.array([4.0, 4.0, 12.0, 12.0, 0.0, 0.0]), (b, 1, 1))
        det = det.at[:, 0, 4].set(score)
        return det, jnp.ones((b,), jnp.int32)


def _toy_loader(n_batches=2):
    batches = []
    for _ in range(n_batches):
        batches.append(
            {
                "img": np.zeros((2, 16, 16, 3), np.float32),
                "labels": [
                    {"boxes": np.array([[4.0, 4.0, 12.0, 12.0]]), "cls": np.array([0])}
                    for _ in range(2)
                ],
            }
        )
    return batches


def test_early_stopping():
    es = EarlyStopping(patience=2, mode="max")
    assert not es.update(0.5) and es.improved
    assert not es.update(0.4)
    assert es.update(0.3)  # 2 epochs without improvement
    assert es.best == 0.5


def test_trainer_loop_and_artifacts(tmp_path):
    det = _ToyDetector()
    loader = _toy_loader()
    tr = Trainer(det, loader, loader, nc=1, cfg={"epochs": 3, "patience": 5,
                                                 "save_dir": str(tmp_path), "min_score": 0.0})
    out = tr.start_training()
    assert len(out["history"]) == 3
    run = tmp_path / "exp"
    assert (run / "args.yaml").exists()
    assert (run / "coco_stats.csv").exists()
    assert (run / "best.ckpt").exists() and (run / "last.ckpt").exists()
    df = read_coco_stats(run / "coco_stats.csv")
    assert len(df) == 3
    # the toy detector's box matches GT exactly → AP should be perfect
    assert df["AP"].iloc[-1] == pytest.approx(1.0, abs=1e-4)
    # training reduced the loss (score → 1)
    assert out["history"][-1]["train_loss"] < out["history"][0]["train_loss"]
    # curves plot runs
    plt_coco_stats(run / "coco_stats.csv", save_path=str(run / "curves.png"))
    assert (run / "curves.png").exists()


def test_default_val():
    det = _ToyDetector()
    v = det.init(jax.random.PRNGKey(0))
    stats = default_val(det, v, _toy_loader(1), nc=1, min_score=0.0)
    assert stats["AP"] == pytest.approx(1.0, abs=1e-4)


def test_tools(tmp_path):
    d1 = find_new_dir(tmp_path, "exp")
    d1.mkdir()
    d2 = find_new_dir(tmp_path, "exp")
    assert d2.name == "exp2"
    assert numeric_sort(["f10.txt", "f2.txt", "f1.txt"]) == ["f1.txt", "f2.txt", "f10.txt"]


def test_find_plot_size():
    assert find_plot_size(64) == (8, 8)
    r, c = find_plot_size(7)
    assert r * c >= 7


def test_feature_extraction(tmp_path):
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov13n_DBL.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    feats = extract_features(m, v, jnp.zeros((1, 64, 64, 3)), layer_indices=[0, 5])
    assert any(k.startswith("m0") for k in feats)
    assert any(k.startswith("m5") for k in feats)
    cached = tmp_path / "feats.pkl"
    extract_features(m, v, jnp.zeros((1, 64, 64, 3)), layer_indices=[0], cache_path=str(cached))
    assert cached.exists()


def test_conf_matrix_plot(tmp_path):
    mat = np.array([[5, 1, 0], [0, 4, 1], [1, 0, 3]])
    replot_conf_matrix(mat, names=["a", "b"], save_path=str(tmp_path / "cm.png"))
    assert (tmp_path / "cm.png").exists()


def test_grad_accumulation_multisteps():
    """With grad_accumulate, params move only every nbs/batch steps."""
    import optax
    from yolo_dbl_tpu.cfg import get_cfg
    from yolo_dbl_tpu.engine.train_state import build_optimizer

    params = {"w": jnp.ones((4,))}
    cfg = get_cfg(overrides={"batch": 16, "optimizer": "SGD", "grad_accumulate": True, "epochs": 2})
    tx, _ = build_optimizer(params, 3, cfg, steps_per_epoch=10)
    state = tx.init(params)
    g = {"w": jnp.ones((4,))}
    p = params
    steps = []
    for i in range(8):  # accumulate = 64/16 = 4
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
        steps.append(int(state.gradient_step))
    # the inner optimizer steps once per 4 micro-steps
    assert steps == [0, 0, 0, 1, 1, 1, 1, 2]
