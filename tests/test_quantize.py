"""int8 serving mode (ops/quantize.py): math oracle + whole-model drift."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.ops.quantize import _eligible, int8_serving


def _manual_int8(x, w, b=None, stride=1, pad=1):
    """Hand-computed dynamic symmetric int8 oracle (numpy-side math)."""
    wf = np.asarray(w, np.float32)
    ws = np.maximum(np.abs(wf).max(axis=(0, 1, 2), keepdims=True) / 127.0, 1e-12)
    w8 = np.clip(np.round(wf / ws), -127, 127).astype(np.int8)
    xf = np.asarray(x, np.float32)
    xs = max(np.abs(xf).max() / 127.0, 1e-12)
    x8 = np.clip(np.round(xf / xs), -127, 127).astype(np.int8)
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x8), jnp.asarray(w8), (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = np.asarray(y, np.float32) * (ws.reshape(1, 1, 1, -1) * xs)
    if b is not None:
        y = y + np.asarray(b, np.float32)
    return y


def test_int8_conv_matches_manual_oracle():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)).astype(np.float32))
    conv = nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True)
    v = conv.init(jax.random.PRNGKey(0), x)

    with int8_serving():
        got = conv.apply(v, x)
    want = _manual_int8(x, v["params"]["kernel"], v["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # and it actually differs from (but approximates) the f32 path
    exact = np.asarray(conv.apply(v, x))
    assert not np.allclose(np.asarray(got), exact, atol=1e-7)
    rel = np.abs(np.asarray(got) - exact).max() / np.abs(exact).max()
    assert rel < 0.05, f"int8 drift too large: {rel}"


def test_eligibility_rules():
    x128 = jnp.zeros((1, 16, 16, 128))
    x64 = jnp.zeros((1, 160, 160, 64))
    xbig = jnp.zeros((1, 320, 320, 16))

    def probe(conv, x):
        seen = {}

        def catcher(next_fun, args, kwargs, context):
            if context.method_name == "__call__" and type(context.module) is nn.Conv:
                seen["eligible"] = _eligible(context.module, args[0])
            return next_fun(*args, **kwargs)

        v = conv.init(jax.random.PRNGKey(0), x)
        with nn.intercept_methods(catcher):
            conv.apply(v, x)
        return seen["eligible"]

    assert probe(nn.Conv(128, (1, 1)), x128)            # wide channels: yes
    assert not probe(nn.Conv(128, (3, 3)), x64)          # C=64 regression: no
    assert probe(nn.Conv(32, (3, 3)), xbig)              # big spatial: yes
    assert not probe(nn.Conv(128, (3, 3), feature_group_count=128), x128)  # dw: no


def test_init_inside_context_is_safe():
    conv = nn.Conv(128, (3, 3))
    x = jnp.zeros((1, 8, 8, 128))
    with int8_serving():
        v = conv.init(jax.random.PRNGKey(0), x)  # must not try to read params
        out = conv.apply(v, x)
    assert out.shape == (1, 8, 8, 128)


@pytest.mark.compileheavy
def test_flagship_int8_predict_drift_bounded():
    """Whole-graph interception: the flagship predict under int8_serving
    stays finite and close to the bf16 path (dynamic symmetric int8,
    per-channel weight scales)."""
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov13n_DBL.yaml", nc=3)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    base = np.asarray(model.predict(v, x))
    with int8_serving():
        q = np.asarray(model.predict(v, x))
    assert np.isfinite(q).all()
    assert q.shape == base.shape
    # boxes (first 4 rows, pixel units at 64px) and scores drift a little
    box_d = np.abs(q[:, :4] - base[:, :4]).max()
    score_d = np.abs(q[:, 4:] - base[:, 4:]).max()
    assert box_d < 2.0, f"box drift {box_d} px"
    assert score_d < 0.05, f"score drift {score_d}"
    assert not np.allclose(q, base)  # the int8 path actually engaged


def test_degenerate_static_scale_falls_back_to_bf16():
    """A ~zero calibrated scale (dead/gated path at calibration time) must
    leave that conv on the exact path, not clip its activations to zero."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)).astype(np.float32))
    conv = nn.Conv(64, (1, 1), use_bias=False)
    v = conv.init(jax.random.PRNGKey(0), x)

    exact = np.asarray(conv.apply(v, x))
    with int8_serving(scales=[1e-12]):
        got = np.asarray(conv.apply(v, x))
    np.testing.assert_array_equal(got, exact)  # bf16/f32 path untouched


def test_static_scales_match_dynamic_on_calib_batch():
    """calibrate() + int8_serving(scales) == dynamic int8 on the calibration
    batch itself (same per-tensor scale by construction)."""
    from yolo_dbl_tpu.ops.quantize import calibrate

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)).astype(np.float32))
    conv = nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)])
    v = conv.init(jax.random.PRNGKey(0), x)

    scales = calibrate(lambda a: conv.apply(v, a), x)
    assert len(scales) == 1 and scales[0] > 0

    with int8_serving():
        dyn = np.asarray(conv.apply(v, x))
    with int8_serving(scales=scales):
        sta = np.asarray(conv.apply(v, x))
    np.testing.assert_allclose(sta, dyn, rtol=1e-6, atol=1e-6)


def test_predicate_scopes_quantization():
    """int8_serving(predicate=...) quantizes only the scoped convs: a False
    predicate leaves the exact path untouched; a True one matches the
    unscoped int8 output; calibrate() honors the same scope so the scale
    lists line up."""
    from yolo_dbl_tpu.ops.quantize import calibrate

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)).astype(np.float32))
    conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)])
    v = conv.init(jax.random.PRNGKey(0), x)

    exact = np.asarray(conv.apply(v, x))
    with int8_serving(predicate=lambda mod, a: False):
        out_off = np.asarray(conv.apply(v, x))
    np.testing.assert_array_equal(out_off, exact)

    with int8_serving():
        unscoped = np.asarray(conv.apply(v, x))
    with int8_serving(predicate=lambda mod, a: a.shape[-1] >= 128):
        scoped = np.asarray(conv.apply(v, x))
    np.testing.assert_array_equal(scoped, unscoped)

    assert calibrate(lambda a: conv.apply(v, a), x,
                     predicate=lambda mod, a: False) == []
    assert len(calibrate(lambda a: conv.apply(v, a), x,
                         predicate=lambda mod, a: a.shape[-1] >= 128)) == 1


def test_static_scales_survive_retrace():
    """A retrace inside one int8_serving(scales=...) context (second input
    shape) must restart the scale cycle, not exhaust it (ADVICE r4: the old
    shared iterator raised StopIteration mid-trace)."""
    from yolo_dbl_tpu.ops.quantize import calibrate

    rng = np.random.default_rng(3)
    x8 = jnp.asarray(rng.standard_normal((1, 8, 8, 128)).astype(np.float32))
    x16 = jnp.asarray(rng.standard_normal((1, 16, 16, 128)).astype(np.float32))
    conv = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)])
    v = conv.init(jax.random.PRNGKey(0), x8)
    scales = calibrate(lambda a: conv.apply(v, a), x8)
    assert len(scales) == 1

    f = jax.jit(lambda var, a: conv.apply(var, a))
    with int8_serving(scales=scales):
        y8 = f(v, x8)
        y16 = f(v, x16)  # new shape -> retrace inside the same context
        y8b = f(v, x8)
    # the retrace used the SAME calibrated scale as the first trace
    with int8_serving(scales=scales):
        want16 = jax.jit(lambda var, a: conv.apply(var, a))(v, x16)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(want16), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y8b), rtol=1e-6)

    # empty scales + an eligible conv is a loud error, not silent bf16
    with pytest.raises(ValueError, match="captured nothing"):
        with int8_serving(scales=[]):
            conv.apply(v, x8)
