"""Opt-in int8 serving mode: dynamic quantization of the conv trunk.

The round-4 roofline (PROFILE.md) showed the b128 flagship inference step is
HBM-bandwidth-bound at ~67% of peak, and the `tools/exp_int8.py` probe
measured int8×int8→int32 convs at 1.5-2.5× the bf16 path on the hot shapes
(the v5e MXU runs int8 at 2× bf16 TOPS and the activation streams halve).
This module turns that into a usable serving mode WITHOUT touching any
model code: a flax method interceptor rewrites every eligible `nn.Conv`
call in whatever model is being traced — the whole zoo inherits it.

Scheme (standard dynamic PTQ, no calibration pass needed):
  * weights: symmetric per-OUTPUT-CHANNEL int8 (`w8 = round(w / ws)`,
    `ws = max|w| per O / 127`) — computed inside the traced graph from the
    bf16 params (one pass over ~20 MB of weights, negligible);
  * activations: symmetric per-TENSOR int8 with a runtime scale
    (`xs = max|x| / 127`) — one cheap reduction per conv;
  * accumulation in int32 on the MXU, rescale `y * (ws · xs)` in f32,
    bias added post-rescale, output cast back to the incoming dtype so
    BN/SiLU and everything downstream is unchanged.

Eligibility (measured, tools/exp_int8.py): dense convs only
(feature_group_count == 1) with C_in ≥ 128, plus the big-spatial early
convs (C_in ≥ 8 and H ≥ 320) which won 1.53× despite narrow channels; the
C_in=64 mid shapes regressed (0.55×) and stay bf16. Depthwise convs stay
bf16 (grouped int8 lowering unproven and their cost is tiny —
tools/exp_depthwise.py).

Usage:
    from yolo_dbl_tpu.ops.quantize import calibrate, int8_serving

    # dynamic (no calibration; runtime per-tensor act scales):
    with int8_serving():
        pred = jax.jit(lambda v, x: model.predict(v, x))(v, img)

    # static (calibrated): one representative batch -> per-conv scales;
    # the runtime max-reduction disappears and the quantize fuses into the
    # producing op's epilogue
    scales = calibrate(lambda: model.predict(v, calib_img))
    with int8_serving(scales=scales):
        pred = jax.jit(lambda v, x: model.predict(v, x))(v, img)

Measured (real v5e, b128@640 flagship, 2026-08-19, tools/exp_int8_e2e.py):
e2e int8 serving is a NO-GO for throughput on this stack — bf16 1107,
int8-static 1055 (0.95x), int8-dynamic 872 (0.79x) img/s/chip. The
shape-level probe's 1.5-2.5x conv wins don't survive composition: the step
is HBM-bandwidth-bound (PROFILE.md roofline, 21% MFU), and the flagship's
activations feed shortcuts/concats as well as convs, so the bf16 tensor
must materialize regardless — the quantize pass is pure ADDED traffic
(read bf16 + write int8) instead of replacing the bf16 stream. The module
stays as a tested opt-in for compute-bound regimes (small models on big
meshes, future fused int8 Pallas trunk); full analysis in PROFILE.md
"int8 serving e2e".

Accuracy contract: symmetric int8 with per-channel weight scales — the same
scheme as the int8 TFLite export path (engine/exporter.py PTQ,
round-trip-tested). `tests/test_quantize.py` pins the math against a
hand-computed oracle and bounds the flagship output drift.
"""

from __future__ import annotations

import contextlib
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _eligible(mod: nn.Module, x: jnp.ndarray) -> bool:
    if not type(mod) is nn.Conv:  # not ConvTranspose / subclasses
        return False
    if mod.is_initializing():  # params don't exist yet — let init create them
        return False
    if mod.feature_group_count != 1:
        return False
    d = mod.input_dilation
    if d is not None and tuple(_pair(d)) != (1, 1):
        return False
    if x.ndim != 4:  # NHWC 2-D convs only
        return False
    c_in = x.shape[-1]
    return c_in >= 128 or (c_in >= 8 and x.shape[1] >= 320)


def _pair(v, n=2):
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _norm_padding(padding, kernel_size: Sequence[int], dilation: Sequence[int]):
    """nn.Conv padding attr → lax conv padding argument."""
    if isinstance(padding, str):
        return padding  # 'SAME' / 'VALID' / 'CIRCULAR' unsupported below
    if isinstance(padding, int):
        return [(padding, padding)] * len(kernel_size)
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _int8_conv_call(mod: nn.Conv, x: jnp.ndarray, act_scale=None) -> jnp.ndarray:
    w = mod.variables["params"]["kernel"]  # (kh, kw, I, O)
    kh, kw = w.shape[0], w.shape[1]
    wf = w.astype(jnp.float32)
    ws = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0  # per-O
    ws = jnp.maximum(ws, 1e-12)
    w8 = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    if act_scale is None:
        xs = jnp.max(jnp.abs(xf)) / 127.0  # per-tensor, dynamic
        xs = jnp.maximum(xs, 1e-12)
    else:
        # static calibrated scale: a compile-time python float — the
        # quantize below is a fusable scale+round+clip+cast epilogue
        xs = max(float(act_scale) / 127.0, 1e-12)
    x8 = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)

    pad = _norm_padding(mod.padding, (kh, kw), _pair(mod.kernel_dilation))
    if isinstance(pad, str) and pad == "CIRCULAR":
        raise NotImplementedError("int8 serving: CIRCULAR padding")
    y = jax.lax.conv_general_dilated(
        x8, w8,
        window_strides=_pair(mod.strides),
        padding=pad,
        rhs_dilation=_pair(mod.kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (ws.reshape(1, 1, 1, -1) * xs)
    if mod.use_bias:
        y = y + mod.variables["params"]["bias"].astype(jnp.float32)
    return y.astype(mod.dtype or x.dtype)


@contextlib.contextmanager
def int8_serving(scales=None, predicate=None):
    """Context manager: every eligible nn.Conv traced inside runs int8.

    Wrap the TRACE (the jit'd call or its first invocation), not the
    execution — interception happens when flax methods run, i.e. at trace
    time. Re-tracing outside the context restores the bf16 path.

    Args:
        scales: optional list of per-conv activation absmax values from
            `calibrate()` (same model, same trace order, SAME predicate).
            When given, the runtime per-tensor max reduction is replaced by
            a compile-time constant scale. When None, scales are computed
            dynamically. Consumption cycles modulo len(scales): each trace
            visits every eligible conv once in a fixed order, so a RETRACE
            inside the context (second input shape, donation retrace)
            restarts cleanly at scale 0 instead of exhausting an iterator.
        predicate: optional extra scope filter `(module, x) -> bool`, ANDed
            with the built-in eligibility. Lets a caller quantize only a
            structural window (e.g. the early high-resolution chain where
            the int8 stream REPLACES the bf16 one instead of adding to it —
            see PROFILE.md "int8 serving e2e" for why whole-trunk int8
            loses on this architecture).
    """
    scales = list(scales) if scales is not None else None
    counter = [0]  # per-context call index; modulo-cycled so retraces align

    def interceptor(next_fun, args, kwargs, context):
        if context.method_name == "__call__" and args and isinstance(args[0], jnp.ndarray):
            mod = context.module
            if _eligible(mod, args[0]) and (predicate is None or predicate(mod, args[0])):
                if scales is None:
                    s = None
                elif not scales:
                    raise ValueError(
                        "int8_serving(scales=[]) but an eligible conv was traced — "
                        "calibrate() captured nothing for this scope; check the predicate")
                else:
                    s = scales[counter[0] % len(scales)]
                    counter[0] += 1
                # degenerate calibration (a dead/gated path saw ~zero input):
                # a near-zero static scale would clip real serving activations
                # to zero — keep that conv bf16 instead
                if s is not None and float(s) < 1e-8:
                    return next_fun(*args, **kwargs)
                return _int8_conv_call(mod, args[0], act_scale=s)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


def calibrate(apply_fn, *args, predicate=None):
    """Collect per-conv input absmax values for static int8 scales.

    Runs `apply_fn(*args)` ONCE, jitted, over a REPRESENTATIVE batch with a
    capture interceptor active during the trace; each eligible conv's
    max|x| is recorded as a traced value and returned from the compiled
    program, so calibration costs one device dispatch (eager capture would
    dispatch per-op through the TPU tunnel). Returns host floats in trace
    order — the same order `int8_serving(scales=...)` consumes them.
    Pass the SAME `predicate` that serving will use so the orders align.
    """
    captured = []

    def capture(next_fun, fargs, fkwargs, context):
        if context.method_name == "__call__" and fargs and isinstance(fargs[0], jnp.ndarray):
            if _eligible(context.module, fargs[0]) and (
                    predicate is None or predicate(context.module, fargs[0])):
                captured.append(jnp.max(jnp.abs(fargs[0].astype(jnp.float32))))
        return next_fun(*fargs, **fkwargs)

    def wrapped(*a):
        captured.clear()  # retraces restart the collection
        with nn.intercept_methods(capture):
            apply_fn(*a)
        # nothing in scope (e.g. a narrow predicate): return a 0-vector so
        # the jitted program still has an output
        return jnp.stack(captured) if captured else jnp.zeros((0,), jnp.float32)

    vals = jax.jit(wrapped)(*args)
    return [float(v) for v in vals]
