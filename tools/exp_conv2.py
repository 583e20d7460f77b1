"""Conv-module drill-down, honest harness: scan over DISTINCT pre-staged
inputs (single-input scan lets XLA hoist the loop-invariant body — the
first version of this experiment under-read 4-8x)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from yolo_dbl_tpu.nn.common import Conv

DT = jnp.bfloat16
B = 64


def timeit(name, fn, params, make_x, reps=4):
    xs = jnp.stack([make_x(jax.random.PRNGKey(i)) for i in range(reps)])
    xs = jax.block_until_ready(xs)
    params = jax.block_until_ready(jax.device_put(params))

    def many(p, xs):
        def body(acc, x):
            return acc + jnp.sum(fn(p, x).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jitted = jax.jit(many)
    jitted(params, xs).item()
    best = float("inf")
    prev = None
    for _ in range(12):
        t0 = time.perf_counter()
        jitted(params, xs).item()
        jitted(params, xs).item()
        cur = (time.perf_counter() - t0) / 2
        best = min(best, cur)
        if prev is not None and abs(cur - prev) / min(cur, prev) < 0.12:
            break
        prev = cur
    print(f"{name:46s} {best/reps*1000:8.2f} ms  {B/(best/reps):8.1f} img/s", flush=True)


key = jax.random.PRNGKey(0)
shape = (B, 640, 640, 16)
mk = lambda k: jax.random.uniform(k, shape, DT)

mod = Conv(32, 3, 2, dtype=DT)
v = mod.init(key, jnp.zeros((1, 640, 640, 16), DT))
timeit("Conv module (conv+bn+silu) 16->32 s2 @640", lambda p, xx: mod.apply(p, xx), v, mk)

w = jax.random.normal(key, (3, 3, 16, 32), DT) * 0.1


def raw(xx, ww):
    return jax.lax.conv_general_dilated(
        xx, ww, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


timeit("raw conv+silu 16->32 s2 @640", lambda ww, xx: jax.nn.silu(raw(xx, ww)), w, mk)

# NCHW layout
wT = jnp.transpose(w, (3, 2, 0, 1))  # OIHW


def raw_nchw(ww, xx):
    xx = jnp.transpose(xx, (0, 3, 1, 2))
    y = jax.lax.conv_general_dilated(
        xx, ww, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(jax.nn.silu(y), (0, 2, 3, 1))


timeit("raw conv+silu NCHW (transposes incl.)", raw_nchw, wT, mk)

# stem from 3 channels
shape3 = (B, 640, 640, 3)
mk3 = lambda k: jax.random.uniform(k, shape3, DT)
mod3 = Conv(16, 3, 1, dtype=DT)
v3 = mod3.init(key, jnp.zeros((1, 640, 640, 3), DT))
timeit("Conv module 3->16 s1 @640 (stem)", lambda p, xx: mod3.apply(p, xx), v3, mk3)

w3 = jax.random.normal(key, (3, 3, 3, 16), DT) * 0.1
timeit("raw conv+silu 3->16 s1 @640", lambda ww, xx: jax.nn.silu(
    jax.lax.conv_general_dilated(xx, ww, (1, 1), ((1, 1), (1, 1)),
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))), w3, mk3)

# fused stem+p1+bneck chain as one jit (what the real model does)
from yolo_dbl_tpu.nn.blocks import Bottleneck


class Chain:
    def __init__(self):
        self.c1 = Conv(16, 3, 1, dtype=DT)
        self.c2 = Conv(32, 3, 2, dtype=DT)
        self.b = Bottleneck(32, dtype=DT)

    def init(self, key):
        x = jnp.zeros((1, 640, 640, 3), DT)
        v1 = self.c1.init(key, x)
        x = self.c1.apply(v1, x)
        v2 = self.c2.init(key, x)
        x = self.c2.apply(v2, x)
        v3 = self.b.init(key, x)
        return (v1, v2, v3)

    def apply(self, vs, x):
        x = self.c1.apply(vs[0], x)
        x = self.c2.apply(vs[1], x)
        return self.b.apply(vs[2], x)


ch = Chain()
vs = ch.init(key)
timeit("stem+p1conv+bneck chain", lambda p, xx: ch.apply(p, xx), vs, mk3)
