"""Space-to-depth stem rewrite (ops/fused_stem.py): exactness vs the plain
Conv(k3,s1)+Conv(k3,s2) pair, and the full-model opt-in gate."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_dbl_tpu.ops.fused_stem import fused_stem  # noqa: E402


def _mkbn(key, c):
    ks = [jax.random.fold_in(key, i) for i in range(4)]
    return (jax.random.normal(ks[0], (c,)) * 0.2 + 1.0,
            jax.random.normal(ks[1], (c,)) * 0.2,
            jax.random.normal(ks[2], (c,)) * 0.1,
            jax.random.uniform(ks[3], (c,)) + 0.5)


def _bn_act(y, bn, act):
    s, b, m, v = bn
    return act((y - m) * s / jnp.sqrt(v + 1e-3) + b)


@pytest.mark.parametrize("hw,cin,c0,c1", [((16, 20), 3, 16, 32), ((12, 12), 3, 8, 8)])
def test_fused_stem_exact(hw, cin, c0, c1):
    key = jax.random.PRNGKey(0)
    h, w = hw
    x = jax.random.normal(key, (2, h, w, cin))
    w0 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, cin, c0)) * 0.2
    w1 = jax.random.normal(jax.random.fold_in(key, 2), (3, 3, c0, c1)) * 0.2
    bn0, bn1 = _mkbn(jax.random.fold_in(key, 10), c0), _mkbn(jax.random.fold_in(key, 20), c1)
    act = jax.nn.silu

    dn = ("NHWC", "HWIO", "NHWC")
    y0 = jax.lax.conv_general_dilated(x, w0, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
    y0 = _bn_act(y0, bn0, act)
    y1 = jax.lax.conv_general_dilated(y0, w1, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
    want = _bn_act(y1, bn1, act)

    got = fused_stem(x, w0, bn0, w1, bn1, act)
    assert got.shape == want.shape
    assert float(jnp.abs(got - want).max()) < 1e-4


def test_fused_stem_gate_in_model(monkeypatch):
    """With the env gate on, predict output matches the standard path."""
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov13n_DBL.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    monkeypatch.delenv("YOLO_DBL_FUSED_STEM", raising=False)
    std = m.predict(v, x)
    monkeypatch.setenv("YOLO_DBL_FUSED_STEM", "1")
    fused = m.predict(v, x)
    assert float(jnp.abs(std - fused).max()) < 1e-3


def test_fused_stem_train_exact_stats():
    """Train-mode fused stem (fused_stem_convs + Conv.norm_act phase
    grouping): outputs AND BatchNorm running-stat updates match the plain
    Conv+Conv pair bit-for-bit up to fp reassociation."""
    from yolo_dbl_tpu.nn.common import Conv
    from yolo_dbl_tpu.ops.fused_stem import fused_stem_convs
    import flax.linen as nn

    class Pair(nn.Module):
        fused: bool = False

        @nn.compact
        def __call__(self, x, train=True):
            l0 = Conv(16, 3, 1, name="l0")
            l1 = Conv(32, 3, 2, name="l1")
            if not self.fused:
                return l1(l0(x, train), train)
            return fused_stem_convs(
                x,
                l0.variables["params"]["conv"]["kernel"],
                l1.variables["params"]["conv"]["kernel"],
                lambda y: l0.norm_act(y, train=True, phase_groups=4),
                lambda y: l1.norm_act(y, train=True),
            )

    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 20, 3).astype(np.float32))
    v = Pair().init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 20, 3)), train=False)
    want, mut_w = Pair().apply(v, x, train=True, mutable=["batch_stats"])
    # the fused module must see the SAME params: init shares structure
    got, mut_g = Pair(fused=True).apply(v, x, train=True, mutable=["batch_stats"])
    assert float(jnp.abs(got - want).max()) < 1e-4
    for layer in ("l0", "l1"):
        for stat in ("mean", "var"):
            a = mut_w["batch_stats"][layer]["bn"][stat]
            b = mut_g["batch_stats"][layer]["bn"][stat]
            assert float(jnp.abs(a - b).max()) < 1e-5, (layer, stat)


def test_fused_stem_train_gate_in_model(monkeypatch):
    """YOLO_DBL_FUSED_STEM_TRAIN routes the train forward through the fused
    path with matching outputs and stat updates."""
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov13n_DBL.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32))
    monkeypatch.setenv("YOLO_DBL_FUSED_STEM_TRAIN", "0")  # default is platform-gated
    std, mut_s = m.module.apply(v, x, train=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(0)})
    monkeypatch.setenv("YOLO_DBL_FUSED_STEM_TRAIN", "1")
    fused, mut_f = m.module.apply(v, x, train=True, mutable=["batch_stats"],
                                  rngs={"dropout": jax.random.PRNGKey(0)})
    std = std if not isinstance(std, (list, tuple)) else std[0]
    fused = fused if not isinstance(fused, (list, tuple)) else fused[0]
    assert float(jnp.abs(jnp.asarray(std) - jnp.asarray(fused)).max()) < 1e-3
    s0 = mut_s["batch_stats"]["m0"]["bn"]["mean"]
    f0 = mut_f["batch_stats"]["m0"]["bn"]["mean"]
    assert float(jnp.abs(s0 - f0).max()) < 1e-5
