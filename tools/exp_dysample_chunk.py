"""DySample one-hot chunk-size sweep at b128 shapes (slope-timed)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from yolo_dbl_tpu.nn import blocks as B
from yolo_dbl_tpu.ops import resample

DT = jnp.bfloat16
BATCH = 128
R_LO, R_HI = 2, 6


def _run(fn, params, xs):
    def many(p, xs):
        def body(acc, x):
            return acc + jnp.sum(fn(p, x).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jitted = jax.jit(many)
    jitted(params, xs).item()
    best = float("inf")
    prev = None
    for _ in range(8):
        t0 = time.perf_counter()
        jitted(params, xs).item()
        cur = time.perf_counter() - t0
        best = min(best, cur)
        if prev is not None and abs(cur - prev) / min(cur, prev) < 0.10:
            break
        prev = cur
    return best


def timeit(name, fn, params, make_x):
    xs = jax.block_until_ready(jnp.stack(
        [make_x(jax.random.PRNGKey(i)) for i in range(R_HI)]))
    params = jax.block_until_ready(jax.device_put(params))
    t_lo = _run(fn, params, xs[:R_LO])
    t_hi = _run(fn, params, xs)
    ms = (t_hi - t_lo) / (R_HI - R_LO) * 1000
    print(f"{name:46s} {ms:8.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
for chunk_mb in (128, 256, 512, 1024, 4096):
    resample._ONEHOT_CHUNK_BYTES = chunk_mb * 1024 * 1024
    mod = B.DySample(256, 2, "lp", 4, dtype=DT)
    v = mod.init(key, jnp.zeros((1, 40, 40, 256), DT))
    timeit(f"dysample256 40->80 b128 chunk={chunk_mb}MB",
           lambda p, x: mod.apply(p, x), v,
           lambda k: jax.random.uniform(k, (BATCH, 40, 40, 256), DT))
