"""Why is the Conv module 4x slower than the raw lax conv it wraps?"""
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


def timeit(name, fn, *args, reps=8):
    args = jax.block_until_ready(jax.device_put(args))

    def many(*a):
        def body(acc, _):
            out = fn(*a)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return acc

    jitted = jax.jit(many)
    jitted(*args).item()
    best = float("inf")
    prev = None
    for _ in range(12):
        t0 = time.perf_counter()
        jitted(*args).item()
        jitted(*args).item()
        cur = (time.perf_counter() - t0) / 2
        best = min(best, cur)
        if prev is not None and abs(cur - prev) / min(cur, prev) < 0.12:
            break
        prev = cur
    print(f"{name:46s} {best/reps*1000:8.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (B, 640, 640, 16), DT)

mod = Conv(32, 3, 2, dtype=DT)
v = mod.init(key, jnp.zeros((1, 640, 640, 16), DT))
timeit("Conv module (conv+bn+silu)", lambda p, xx: mod.apply(p, xx), v, x)

mod_noact = Conv(32, 3, 2, act=False, dtype=DT)
v2 = mod_noact.init(key, jnp.zeros((1, 640, 640, 16), DT))
timeit("Conv module act=False (conv+bn)", lambda p, xx: mod_noact.apply(p, xx), v2, x)

w = jax.random.normal(key, (3, 3, 16, 32), DT) * 0.1


def raw(xx, ww):
    return jax.lax.conv_general_dilated(
        xx, ww, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


timeit("raw conv (explicit pad (1,1))", raw, x, w)
timeit("raw conv + silu", lambda xx, ww: jax.nn.silu(raw(xx, ww)), x, w)

sc = jax.random.normal(key, (32,), jnp.float32)
bi = jax.random.normal(key, (32,), jnp.float32)
mean = jax.random.normal(key, (32,), jnp.float32)
var = jax.random.uniform(key, (32,), jnp.float32) + 0.5


def raw_bn(xx, ww, sc, bi, mean, var):
    y = raw(xx, ww)
    inv = (sc * jax.lax.rsqrt(var + 1e-3)).astype(DT)
    return jax.nn.silu(y * inv + (bi - mean * sc * jax.lax.rsqrt(var + 1e-3)).astype(DT))


timeit("raw conv + manual-affine bn + silu", raw_bn, x, w, sc, bi, mean, var)

# flax BatchNorm alone at this shape
import flax.linen as nn

bn = nn.BatchNorm(use_running_average=True, momentum=0.97, epsilon=1e-3, dtype=DT)
y0 = jnp.zeros((1, 320, 320, 32), DT)
vb = bn.init(key, y0)
xb = jax.random.uniform(key, (B, 320, 320, 32), DT)
timeit("flax BatchNorm eval @320x320x32", lambda p, xx: bn.apply(p, xx), vb, xb)

# fp32 param cast cost? conv with fp32 weights cast inside
w32 = w.astype(jnp.float32)
timeit("raw conv (bf16 x, fp32 w cast in)", lambda xx, ww: raw(xx, ww.astype(DT)), x, w32)
