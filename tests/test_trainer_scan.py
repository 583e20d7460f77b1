"""Multi-step scan dispatch (engine/trainer.py make_train_scan): K steps in
one dispatch must be BITWISE identical to K per-step dispatches — rng folds
on state.step inside the step, so the streams line up by construction.
(Round-3 perf fix: per-dispatch overhead was ~10x the step's compute on the
remote runtime; see tools/exp_train_scan.py.)
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from yolo_dbl_tpu.engine.trainer import Trainer  # noqa: E402
from yolo_dbl_tpu.nn.tasks import DetectionModel  # noqa: E402

YAML = {"nc": 2, "backbone": [
    [-1, 1, "Conv", [8, 3, 2]],
    [-1, 1, "Conv", [16, 3, 2]],
    [-1, 1, "Conv", [32, 3, 2]],
], "head": [[[-1], 1, "Detect", ["nc"]]]}


def _batches(k=3, b=2, imgsz=64, max_gt=4):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(k):
        out.append({
            "img": (rng.random((b, imgsz, imgsz, 3)) * 255).astype(np.uint8),
            "gt_boxes": np.tile(np.array([[[0.5, 0.5, 0.4, 0.4]]], np.float32), (b, max_gt, 1)),
            "gt_cls": np.zeros((b, max_gt), np.int32),
            "gt_mask": np.pad(np.ones((b, 1), np.float32), ((0, 0), (0, max_gt - 1))),
        })
    return out


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.compileheavy
def test_step_many_matches_per_step():
    key = jax.random.PRNGKey(0)
    batches = _batches()

    m1 = DetectionModel(YAML, nc=2)
    t1 = Trainer(m1, overrides={"imgsz": 64, "batch": 2}).setup(steps_per_epoch=10, imgsz=64)
    for b in batches:
        t1.step(b, key)

    m2 = DetectionModel(YAML, nc=2)
    t2 = Trainer(m2, overrides={"imgsz": 64, "batch": 2}).setup(steps_per_epoch=10, imgsz=64)
    metrics = t2.step_many(batches, key)
    assert np.asarray(metrics["loss"]).shape == (len(batches),)

    assert int(t1.state.step) == int(t2.state.step) == len(batches)
    # scan compiles a different XLA program than the standalone step, so
    # float reassociation can shift last ulps — equality is up to tight tol
    for a, b in zip(_leaves(t1.state.params), _leaves(t2.state.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)
    for a, b in zip(_leaves(t1.state.ema_params), _leaves(t2.state.ema_params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_uint8_batch_matches_float_batch():
    """format_batch now ships uint8; device_normalize must reproduce the old
    host astype(f32)/255 exactly (u8/255 is exact in f32)."""
    key = jax.random.PRNGKey(1)
    batches = _batches(k=2)
    fbatches = [dict(b, img=b["img"].astype(np.float32) / 255.0) for b in batches]

    m1 = DetectionModel(YAML, nc=2)
    t1 = Trainer(m1, overrides={"imgsz": 64, "batch": 2}).setup(steps_per_epoch=10, imgsz=64)
    m2 = DetectionModel(YAML, nc=2)
    t2 = Trainer(m2, overrides={"imgsz": 64, "batch": 2}).setup(steps_per_epoch=10, imgsz=64)
    for b, fb in zip(batches, fbatches):
        t1.step(b, key)
        t2.step(fb, key)
    # device u8/255 compiles to multiply-by-reciprocal; host numpy divides —
    # identical to the last ulp is not guaranteed, tight tol is
    for a, b in zip(_leaves(t1.state.params), _leaves(t2.state.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_nonfinite_grads_skip_update():
    """Reference AMP GradScaler semantics (trainer.py:586): a step whose
    gradients contain inf/NaN must be SKIPPED, not applied — a degenerate
    batch (constant image → zero BN variance → overflowing backward) then
    costs one step instead of permanently-NaN params. build_optimizer wraps
    the chain in optax.apply_if_finite."""
    import jax.numpy as jnp

    from yolo_dbl_tpu.cfg import get_cfg
    from yolo_dbl_tpu.engine.train_state import build_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx, _ = build_optimizer(params, nc=3, cfg=get_cfg(), steps_per_epoch=10)
    opt_state = tx.init(params)

    bad = {"w": jnp.full((4, 4), jnp.nan), "b": jnp.full((4,), jnp.inf)}
    updates, opt_state = tx.update(bad, opt_state, params)
    for leaf in jax.tree_util.tree_leaves(updates):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)

    good = {"w": jnp.ones((4, 4)) * 0.1, "b": jnp.ones((4,)) * 0.1}
    # two good updates: the first lands on inner count 0 where warmup LR is
    # exactly 0 (update is legitimately zero); the second must be non-zero —
    # proving the bad step did not poison or permanently halt the chain
    updates, opt_state = tx.update(good, opt_state, params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(updates))
    updates, opt_state = tx.update(good, opt_state, params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(updates))
    assert any(np.abs(np.asarray(l)).max() > 0 for l in jax.tree_util.tree_leaves(updates))


def test_remat_loss_step_matches_base():
    """make_train_step(remat_loss=True) must be a pure schedule change:
    jax.checkpoint recomputes the loss forward in the backward instead of
    saving residuals, so params after one step match the base step to
    reassociation tolerance (the traffic A/B lives in
    tools/exp_loss_remat.py)."""
    from yolo_dbl_tpu.engine.trainer import make_train_step

    key = jax.random.PRNGKey(0)
    b = _batches(k=1)[0]

    m = DetectionModel(YAML, nc=2)
    t = Trainer(m, overrides={"imgsz": 64, "batch": 2}).setup(steps_per_epoch=10, imgsz=64)

    base = jax.jit(make_train_step(m, t.cfg, t.tx))
    remat = jax.jit(make_train_step(m, t.cfg, t.tx, remat_loss=True))

    s1, met1 = base(t.state, b, key)
    s2, met2 = remat(t.state, b, key)
    np.testing.assert_allclose(float(met1["loss"]), float(met2["loss"]), rtol=1e-6)
    for a, c in zip(_leaves(s1.params), _leaves(s2.params)):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-7)
