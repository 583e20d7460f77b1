"""Concat-fold (Conv.call_parts): conv1x1(concat(parts)) as kernel-slice
matmul sums — exactness vs the concat form, unchanged param tree, gradient
parity, and fallback gating (tools/exp_concat_fold.py measured the TPU win;
these tests pin the math on any backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.nn import blocks
from yolo_dbl_tpu.nn.common import Conv


@pytest.fixture
def fold_on(monkeypatch):
    monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT", "1")


@pytest.fixture
def fold_off(monkeypatch):
    monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT", "0")


def _run(module, x, env, monkeypatch, train=False):
    monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT", env)
    params = module.init(jax.random.PRNGKey(0), x, train)
    out = module.apply(params, x, train,
                       mutable=["batch_stats"] if train else False)
    return params, out


@pytest.mark.parametrize("cls,kw", [
    (blocks.C2f, dict(c2=32, n=2)),
    (blocks.C3k2, dict(c2=32, n=2)),
    (blocks.SPPF, dict(c2=32)),
])
def test_fold_matches_concat_and_param_tree(cls, kw, monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32), jnp.float32)
    m = cls(**kw)
    p_fold, y_fold = _run(m, x, "1", monkeypatch)
    p_cat, y_cat = _run(m, x, "0", monkeypatch)
    assert jax.tree_util.tree_structure(p_fold) == jax.tree_util.tree_structure(p_cat)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_cat),
                               rtol=1e-5, atol=1e-5)


def test_fold_mixed_width_fusemodule(monkeypatch):
    xs = [jax.random.normal(jax.random.PRNGKey(i), (2, s, s, c), jnp.float32)
          for i, (s, c) in enumerate([(16, 16), (8, 16), (4, 32)])]
    m = blocks.FuseModule(c_in=16, channel_adjust=True)
    monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT", "1")
    p = m.init(jax.random.PRNGKey(0), xs, False)
    y1 = m.apply(p, xs, False)
    monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT", "0")
    y0 = m.apply(p, xs, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-5)


def test_fold_gradient_parity(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16), jnp.float32)
    m = blocks.C2f(c2=16, n=1)
    monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT", "1")
    params = m.init(jax.random.PRNGKey(0), x, False)

    def loss(p, env):
        monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT", env)
        return jnp.sum(m.apply(p, x, False) ** 2)

    g1 = jax.grad(lambda p: loss(p, "1"))(params)
    g0 = jax.grad(lambda p: loss(p, "0"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fold_gating_falls_back(fold_on):
    """Ineligible convs (k!=1, strided, grouped) and maps above the spatial
    threshold take the concat path — outputs still exact."""
    parts = [jax.random.normal(jax.random.PRNGKey(i), (1, 6, 6, 8), jnp.float32)
             for i in range(2)]
    for kw in (dict(k=3), dict(s=2), dict(g=2)):
        m = Conv(c2=8, **kw)
        p = m.init(jax.random.PRNGKey(0), jnp.concatenate(parts, -1), False)
        y_parts = m.apply(p, method=lambda mdl: mdl.call_parts(parts, False))
        y_cat = m.apply(p, jnp.concatenate(parts, -1), False)
        np.testing.assert_allclose(np.asarray(y_parts), np.asarray(y_cat),
                                   rtol=1e-6, atol=1e-6)


def test_fold_spatial_threshold(monkeypatch):
    monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT", "1")
    monkeypatch.setenv("YOLO_DBL_FOLD_CONCAT_MAXHW", "16")
    parts = [jax.random.normal(jax.random.PRNGKey(i), (1, 8, 8, 4), jnp.float32)
             for i in range(2)]  # 64 px > 16 → concat path
    m = Conv(c2=8, k=1)
    p = m.init(jax.random.PRNGKey(0), jnp.concatenate(parts, -1), False)
    y_parts = m.apply(p, method=lambda mdl: mdl.call_parts(parts, False))
    y_cat = m.apply(p, jnp.concatenate(parts, -1), False)
    np.testing.assert_allclose(np.asarray(y_parts), np.asarray(y_cat),
                               rtol=1e-6, atol=1e-6)


def test_fold_channel_mismatch_raises(fold_on):
    parts = [jnp.ones((1, 4, 4, 4)), jnp.ones((1, 4, 4, 4))]
    m = Conv(c2=8, k=1)
    p = m.init(jax.random.PRNGKey(0), jnp.concatenate(parts, -1), False)
    with pytest.raises(ValueError, match="channel mismatch"):
        m.apply(p, method=lambda mdl: mdl.call_parts(parts[:1] * 3, False))
