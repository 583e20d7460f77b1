"""Depthwise-conv backward on TPU: XLA grouped conv vs shift-multiply form.

tools/exp_train_breakdown.py pinned DSC3k2@80 backward at 22.1 ms (b16) —
the largest per-module cost left in the train step — and LSK at 6.3 ms.
Both are dominated by full-group depthwise convs (feature_group_count=C),
whose wgrad XLA lowers as a batch-contracting grouped conv, a known weak
lowering on TPU (the MXU sees K=k*k=tiny contractions).

Hypothesis: a shift-multiply formulation — out = Σ_{ij} shift(x,i,j)·w[ij]
— keeps forward AND both backward legs as pure VPU elementwise fusions
(dgrad = Σ shiftᵀ(g)·w, wgrad = per-tap elementwise-product reductions)
with no layout churn, beating the grouped-conv lowering for small k.

Run on the real chip:  python tools/exp_depthwise.py [--batch 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16


def dw_grouped(x, w, d=1):
    """Reference: flax-style depthwise via feature_group_count=C.
    x (B,H,W,C), w (k,k,1,C) HWIO."""
    c = x.shape[-1]
    k = w.shape[0]
    p = d * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(p, p), (p, p)],
        rhs_dilation=(d, d), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dw_shift(x, w, d=1):
    """Same math as k*k shifted elementwise multiply-adds.

    Accumulates in f32 (matching the grouped conv's on-MXU f32 accumulation)
    and casts back to the input dtype at the end, so parity with dw_grouped
    holds to bf16 output rounding rather than k*k compounded bf16 adds.
    """
    k = w.shape[0]
    p = d * (k - 1) // 2
    h, wd = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = jnp.zeros(x.shape, jnp.float32)
    for i in range(k):
        for j in range(k):
            tap = xp[:, i * d:i * d + h, j * d:j * d + wd, :] * w[i, j, 0]
            out = out + tap.astype(jnp.float32)
    return out.astype(x.dtype)


R_LO, R_HI = 2, 10


def time_vg(name, fn, args):
    """Slope-timed grad step: scan over R_LO vs R_HI distinct stacked inputs,
    report (T_hi - T_lo)/(R_HI - R_LO) — the exp_slope.py idiom, which cancels
    the fixed per-call axon dispatch floor instead of averaging it in."""
    def loss(a):
        return jnp.sum(fn(*a).astype(jnp.float32))

    g = jax.grad(loss)

    keys = [jax.random.PRNGKey(i) for i in range(R_HI)]
    xs_hi = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[tuple(jax.random.normal(jax.random.fold_in(k, n), a.shape, DT)
                for n, a in enumerate(args)) for k in keys])
    xs_hi = jax.block_until_ready(xs_hi)
    xs_lo = jax.tree_util.tree_map(lambda l: l[:R_LO], xs_hi)

    def many(xs):
        def body(acc, a):
            gr = g(a)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves(gr)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jit = jax.jit(many)

    def best_of(xs, tries=6):
        jit(xs).item()  # compile / warm
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            jit(xs).item()
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_of(xs_lo)
    t_hi = best_of(xs_hi)
    ms = (t_hi - t_lo) / (R_HI - R_LO) * 1e3  # slope per rep
    print(f"{name:42s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    b = args.batch
    print(f"# devices: {jax.devices()}  batch={b}", file=sys.stderr)

    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), DT)

    cases = [
        # DSBottleneck cv1/cv2 hot shapes in yolov13s_DBL (P3 80x80x256 ladder)
        ("dw k3 d1 @80x80x256", 3, 1, (b, 80, 80, 256)),
        ("dw k5 d1 @80x80x256", 5, 1, (b, 80, 80, 256)),
        ("dw k7 d1 @40x40x512", 7, 1, (b, 40, 40, 512)),
        # LSK branches at P5
        ("dw k5 d1 @20x20x512", 5, 1, (b, 20, 20, 512)),
        ("dw k7 d3 @20x20x512", 7, 3, (b, 20, 20, 512)),
    ]
    for name, k, d, shape in cases:
        x = mk(shape)
        w = mk((k, k, 1, shape[-1]))
        # parity first: relative to the output scale (both paths accumulate
        # in f32; only bf16 output rounding should remain)
        ya = dw_grouped(x, w, d).astype(jnp.float32)
        yb = dw_shift(x, w, d).astype(jnp.float32)
        scale = jnp.max(jnp.abs(ya)).item() or 1.0
        err = jnp.max(jnp.abs(ya - yb)).item() / scale
        assert err < 2e-2, (name, err)
        a = time_vg(f"{name} grouped", lambda x, w, d=d: dw_grouped(x, w, d), (x, w))
        s = time_vg(f"{name} shift  ", lambda x, w, d=d: dw_shift(x, w, d), (x, w))
        print(f"{name}: grouped {a:.2f} ms vs shift {s:.2f} ms  "
              f"({a / max(s, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
