"""Isolated A/B: backward cost of the 640-res stem pair, standard vs
space-to-depth (ops/fused_stem.py) form.

Round-3 finding driving this: grad:stem_conv16@640 + grad:conv32s2@640 =
42 ms of the 175 ms b16 grad_model (tools/exp_train_breakdown.py) — the
C=3/16 minor dims leave the 128-lane vector unit nearly empty in the
wgrad/dgrad convs too, not just forward. If the s2d form's backward is
~3x cheaper in isolation (like its forward), a train-capable fused stem
is worth the BN-stats plumbing.

Run: python tools/exp_stem_grad.py [--batch 16]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from yolo_dbl_tpu.ops.fused_stem import fused_stem, scatter_s1_kernel, scatter_s2_kernel, _s2d, _bn_act

DT = jnp.bfloat16


def time_fn(name, fn, params, make_input, reps=6, batch=16):
    xs = jnp.stack([make_input(jax.random.PRNGKey(i)) for i in range(reps)])
    xs = jax.block_until_ready(xs)
    params = jax.block_until_ready(params)

    def many(p, xs):
        def body(acc, x):
            out = fn(p, x)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out)), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    jitted = jax.jit(many)
    jitted(params, xs).item()

    def window(n=2):
        t0 = time.perf_counter()
        for _ in range(n):
            jitted(params, xs).item()
        return (time.perf_counter() - t0) / n

    prev = window()
    for _ in range(10):
        cur = window()
        if abs(cur - prev) / min(cur, prev) < 0.15:
            prev = min(prev, cur)
            break
        prev = cur
    ms = prev / reps * 1000
    print(f"{name:28s} {ms:8.2f} ms/iter  {batch/(prev/reps):8.1f} img/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=640)
    args = ap.parse_args()
    b, sz = args.batch, args.imgsz

    key = jax.random.PRNGKey(0)
    w0 = jax.random.normal(key, (3, 3, 3, 16), DT) * 0.1
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 16, 32), DT) * 0.1
    ones16 = jnp.ones(16, jnp.float32)
    ones32 = jnp.ones(32, jnp.float32)
    bn0 = (ones16, 0 * ones16, 0 * ones16, ones16)
    bn1 = (ones32, 0 * ones32, 0 * ones32, ones32)
    act = jax.nn.silu

    def mkimg(k):
        return jax.random.uniform(k, (b, sz, sz, 3), DT)

    def std_pair(p, x):
        ww0, ww1 = p
        y = jax.lax.conv_general_dilated(x, ww0, (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _bn_act(y, bn0, act)
        y = jax.lax.conv_general_dilated(y, ww1, (2, 2), ((1, 1), (1, 1)),
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _bn_act(y, bn1, act)

    def s2d_pair(p, x):
        ww0, ww1 = p
        return fused_stem(x, ww0, bn0, ww1, bn1, act)

    for name, fn in (("fwd:std_pair", std_pair), ("fwd:s2d_pair", s2d_pair)):
        time_fn(name, fn, (w0, w1), mkimg, batch=b)
    for name, fn in (("grad:std_pair", std_pair), ("grad:s2d_pair", s2d_pair)):
        time_fn(name, lambda p, x, f=fn: jax.grad(
            lambda pp: jnp.sum(f(pp, x).astype(jnp.float32)))(p),
            (w0, w1), mkimg, batch=b)


if __name__ == "__main__":
    main()
