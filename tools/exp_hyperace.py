"""HyperACE internals, slope-timed: which stage eats the 15 ms?"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from yolo_dbl_tpu.nn import blocks as B

DT = jnp.bfloat16
BATCH = 64
R_LO, R_HI = 2, 10


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
    for _ in range(10):
        t0 = time.perf_counter()
        jitted(params, xs).item()
        jitted(params, xs).item()
        cur = (time.perf_counter() - t0) / 2
        best = min(best, cur)
        if prev is not None and abs(cur - prev) / min(cur, prev) < 0.10:
            break
        prev = cur
    return best


def timeit(name, fn, params, make_x, budget=3.0):
    probe = make_x(jax.random.PRNGKey(0))
    per = probe.size * probe.dtype.itemsize / 1e9
    r_hi = min(R_HI, max(R_LO + 2, int(budget / max(per, 1e-9))))
    xs = jax.block_until_ready(jnp.stack([make_x(jax.random.PRNGKey(i)) for i in range(r_hi)]))
    params = jax.block_until_ready(jax.device_put(params))
    t_lo = _run(fn, params, xs[:R_LO])
    t_hi = _run(fn, params, xs)
    ms = (t_hi - t_lo) / (r_hi - R_LO) * 1000
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


key = jax.random.PRNGKey(0)
c = 128  # HyperACE hidden: c2=256 * e1=0.5

# FuseModule: inputs P3 (80,80,256), P4 (40,40,256), P5 (20,20,512)
shapes = [(BATCH, 80, 80, 256), (BATCH, 40, 40, 256), (BATCH, 20, 20, 512)]
fuse = B.FuseModule(512, True, dtype=DT)
vf = fuse.init(key, [jnp.zeros(s, DT) for s in shapes])


def mk_packed(k):
    flat = [jax.random.uniform(jax.random.fold_in(k, i), s, DT).reshape(-1) for i, s in enumerate(shapes)]
    return jnp.concatenate(flat)


def unpack(packed):
    xs, o = [], 0
    for s in shapes:
        n = 1
        for d in s:
            n *= d
        xs.append(packed[o:o + n].reshape(s))
        o += n
    return xs


timeit("FuseModule (align+concat+1x1)", lambda p, x: fuse.apply(p, unpack(x)), vf, mk_packed)

# C3AH on (40,40,c) with e2=1 → hidden c
x40 = lambda k: jax.random.uniform(k, (BATCH, 40, 40, c), DT)
c3ah = B.C3AH(c, 1.0, 8, "both", dtype=DT)
vc = c3ah.init(key, jnp.zeros((1, 40, 40, c), DT))
timeit("C3AH (one branch)", lambda p, x: c3ah.apply(p, x), vc, x40)

# AdaHGComputation alone
hg = B.AdaHGComputation(c, 8, c // 16, 0.1, "both", dtype=DT)
vh = hg.init(key, jnp.zeros((1, 40, 40, c), DT))
timeit("AdaHGComputation", lambda p, x: hg.apply(p, x), vh, x40)

# AdaHyperedgeGen alone on tokens
tok = lambda k: jax.random.uniform(k, (BATCH, 1600, c), DT)
gen = B.AdaHyperedgeGen(c, 8, c // 16, 0.1, "both", dtype=DT)
vg = gen.init(key, jnp.zeros((1, 1600, c), DT))
timeit("AdaHyperedgeGen (A matrix)", lambda p, x: gen.apply(p, x), vg, tok)

# DSC3k chain
ds = B.DSC3k(c, n=2, shortcut=False, k1=3, k2=7, dtype=DT)
vd = ds.init(key, jnp.zeros((1, 40, 40, c), DT))
timeit("DSC3k n=2 k2=7", lambda p, x: ds.apply(p, x), vd, x40)

# cv1/cv2 1x1 convs
from yolo_dbl_tpu.nn.common import Conv

cv1 = Conv(3 * c, 1, 1, dtype=DT)
v1 = cv1.init(key, jnp.zeros((1, 40, 40, 512), DT))
x512 = lambda k: jax.random.uniform(k, (BATCH, 40, 40, 512), DT)
timeit("cv1 512->384 1x1", lambda p, x: cv1.apply(p, x), v1, x512)

cv2 = Conv(256, 1, dtype=DT)
v2 = cv2.init(key, jnp.zeros((1, 40, 40, 5 * c), DT))
x5c = lambda k: jax.random.uniform(k, (BATCH, 40, 40, 5 * c), DT)
timeit("cv2 640->256 1x1", lambda p, x: cv2.apply(p, x), v2, x5c)
