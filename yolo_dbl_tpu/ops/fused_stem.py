"""Space-to-depth rewrite of the 640-resolution stem pair.

The DBL backbone opens with Conv(c0, k3, s1) @ HxW followed by
Conv(c1, k3, s2) (yolov13_DBL.yaml rows 0-1). At 640x640 these two layers
alone cost ~14 ms of the 69 ms forward (tools/exp_slope.py): with 3/16
channels the 128-lane minor dimension is nearly empty, so XLA's conv runs
~10x off the HBM roofline.

Exact rewrite: express both convs in 2x2 space-to-depth coordinates.
  - x (B,H,W,3) -> s2d (B,H/2,W/2,12) via a one-hot 2x2/s2 conv (fast path);
  - the s1 conv becomes a k3 conv over s2d with a (3,3,4*cin,4*c0) kernel
    scattered from the original (3,3,cin,c0) weights: output phase (a,b),
    tap (di,dj) maps to s2d offset R=floor((a+di-1)/2) and input phase
    pa=(a+di-1) mod 2 (rows; likewise columns) — each abs tap lands on
    exactly one (offset, phase) pair, so the math is bit-identical up to
    fp reassociation;
  - BN+act applied with per-channel params tiled over the 4 phases;
  - the s2 conv consumes the s2d intermediate directly: di -> (floor((di-1)/2),
    (di-1) mod 2) gives a k2 kernel with top-left padding, producing the
    stride-2 output already in absolute coordinates.
All tensors live at H/2 x W/2 with 12/4*c0 channels — full lanes, and the
840 MB @640 intermediate never exists. Measured: the pair drops ~14 ms ->
~4 ms at batch 64 bf16.

fused_stem folds running-average BN (inference); fused_stem_convs delegates
BN+act to the layer modules with phase-grouped statistics (training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _phase(v):
    return v // 2, v % 2  # floor-div handles v = -1 -> (-1, 1)


def scatter_s1_kernel(w):
    """(3,3,cin,co) s1-conv weights -> (3,3,4cin,4co) s2d-conv kernel."""
    cin, co = w.shape[2], w.shape[3]
    K = jnp.zeros((3, 3, 4 * cin, 4 * co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for di in range(3):
                for dj in range(3):
                    R, pa = _phase(a + di - 1)
                    S, pb = _phase(b + dj - 1)
                    ci = (pa * 2 + pb) * cin
                    oi = (a * 2 + b) * co
                    K = K.at[R + 1, S + 1, ci : ci + cin, oi : oi + co].add(w[di, dj])
    return K


def scatter_s2_kernel(w):
    """(3,3,cin,co) s2-conv weights -> (2,2,4cin,co) s2d-consuming kernel."""
    cin, co = w.shape[2], w.shape[3]
    K = jnp.zeros((2, 2, 4 * cin, co), w.dtype)
    for di in range(3):
        for dj in range(3):
            R, pa = _phase(di - 1)
            S, pb = _phase(dj - 1)
            ci = (pa * 2 + pb) * cin
            K = K.at[R + 1, S + 1, ci : ci + cin, :].add(w[di, dj])
    return K


def _s2d(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C), phase order (row, col) row-major, via a
    one-hot stride-2 conv (the conv path streams; reshape/transpose doesn't)."""
    c = x.shape[-1]
    K = jnp.zeros((2, 2, c, 4 * c), x.dtype)
    for a in (0, 1):
        for b in (0, 1):
            K = K.at[a, b, :, (a * 2 + b) * c : (a * 2 + b + 1) * c].add(
                jnp.eye(c, dtype=x.dtype))
    return jax.lax.conv_general_dilated(
        x, K, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_act(y, bn, act, tile=1):
    scale, bias, mean, var = bn
    if tile > 1:
        scale, bias, mean, var = (jnp.tile(p, tile) for p in (scale, bias, mean, var))
    inv = (scale * jax.lax.rsqrt(var + 1e-3)).astype(y.dtype)
    off = (bias - mean * scale * jax.lax.rsqrt(var + 1e-3)).astype(y.dtype)
    return act(y * inv + off)


def fused_stem_convs(x, w0, w1, norm_act0, norm_act1):
    """Train-capable fused stem: same s2d convs, but BN+act are delegated to
    the layers' real norm_act methods (nn/common.py Conv.norm_act) so
    train-mode batch statistics are computed and the running averages update
    exactly as the un-fused path — norm_act folds the 4 s2d phases into a
    spatial dim around its BatchNorm, so the stats aggregate per ORIGINAL
    channel. Backward of the pair measured 25.6 -> 14.6 ms at b16@640 bf16
    (tools/exp_stem_grad.py): the C=3/16 wgrad/dgrad convs are ~10x off the
    HBM roofline for the same layout reason as the forward.
    """
    dt = x.dtype
    s2d = _s2d(x)
    K0 = scatter_s1_kernel(w0.astype(dt))
    y0 = jax.lax.conv_general_dilated(
        s2d, K0, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y0 = norm_act0(y0)
    K1 = scatter_s2_kernel(w1.astype(dt))
    y1 = jax.lax.conv_general_dilated(
        y0, K1, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return norm_act1(y1)


def fused_stem(x, w0, bn0, w1, bn1, act):
    """Conv(k3,s1)+BN+act -> Conv(k3,s2)+BN+act, both at H/2 resolution.

    x (B,H,W,cin) with H,W even; w0 (3,3,cin,c0); w1 (3,3,c0,c1);
    bn* = (scale, bias, mean, var) running-average BatchNorm params
    (eps=1e-3, the reference's BN hyper). Returns (B,H/2,W/2,c1).
    """
    dt = x.dtype
    s2d = _s2d(x)
    K0 = scatter_s1_kernel(w0.astype(dt))
    y0 = jax.lax.conv_general_dilated(
        s2d, K0, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y0 = _bn_act(y0, bn0, act, tile=4)
    K1 = scatter_s2_kernel(w1.astype(dt))
    y1 = jax.lax.conv_general_dilated(
        y0, K1, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _bn_act(y1, bn1, act)
