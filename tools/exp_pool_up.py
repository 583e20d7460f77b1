"""avg_pool2 / nearest_upsample variants, slope-timed at FuseModule shapes."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
B = 64
R_LO, R_HI = 2, 10


def _run(fn, xs):
    def many(xs):
        def body(acc, x):
            return acc + jnp.sum(fn(x).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jitted = jax.jit(many)
    jitted(xs).item()
    best = float("inf")
    prev = None
    for _ in range(10):
        t0 = time.perf_counter()
        jitted(xs).item()
        jitted(xs).item()
        cur = (time.perf_counter() - t0) / 2
        best = min(best, cur)
        if prev is not None and abs(cur - prev) / min(cur, prev) < 0.10:
            break
        prev = cur
    return best


def timeit(name, fn, shape):
    xs = jax.block_until_ready(jnp.stack(
        [jax.random.uniform(jax.random.PRNGKey(i), shape, DT) for i in range(R_HI)]))
    t_lo = _run(fn, xs[:R_LO])
    t_hi = _run(fn, xs)
    ms = (t_hi - t_lo) / (R_HI - R_LO) * 1000
    print(f"{name:46s} {ms:8.3f} ms", flush=True)


P3 = (B, 80, 80, 256)
P5 = (B, 20, 20, 512)

# ---- avg pool variants on P3
def pool_reshape(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def pool_slices(x):
    return (x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]) * 0.25


def pool_rw(x):
    return jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID") * 0.25


def pool_dwconv(x):
    c = x.shape[-1]
    w = jnp.full((2, 2, 1, c), 0.25, x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


ref = None
for name, fn in [("pool reshape-mean (current)", pool_reshape),
                 ("pool 4 strided slices", pool_slices),
                 ("pool reduce_window", pool_rw),
                 ("pool depthwise conv", pool_dwconv)]:
    x0 = jax.random.uniform(jax.random.PRNGKey(0), P3, DT)
    y = fn(x0)
    if ref is None:
        ref = y
    else:
        err = float(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        assert err < 1e-2, (name, err)
    timeit(name, fn, P3)

# ---- nearest upsample variants on P5
def up_broadcast(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def up_repeat(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def up_convT(x):
    c = x.shape[-1]
    w = jnp.zeros((2, 2, 1, c), x.dtype) + 1.0
    return jax.lax.conv_transpose(
        x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def up_concat(x):
    # duplicate W via concat on a new minor axis then reshape, then H
    b, h, w, c = x.shape
    xw = jnp.concatenate([x[:, :, :, None, :], x[:, :, :, None, :]], 3).reshape(b, h, 2 * w, c)
    xh = jnp.concatenate([xw[:, :, None], xw[:, :, None]], 2).reshape(b, 2 * h, 2 * w, c)
    return xh


refu = None
ups = [("up broadcast-reshape (current)", up_broadcast),
       ("up repeat", up_repeat),
       ("up concat-reshape", up_concat)]
try:
    up_convT(jax.random.uniform(jax.random.PRNGKey(0), P5, DT))
    ups.append(("up grouped conv_transpose", up_convT))
except Exception as e:
    print("conv_transpose grouped unsupported:", type(e).__name__)
for name, fn in ups:
    x0 = jax.random.uniform(jax.random.PRNGKey(0), P5, DT)
    y = fn(x0)
    if refu is None:
        refu = y
    else:
        err = float(jnp.abs(y.astype(jnp.float32) - refu.astype(jnp.float32)).max())
        assert err < 1e-4, (name, err)
    timeit(name, fn, P5)

# ---- full FuseModule dataflow with best-in-class ops, incl. the 1x1 conv
wc = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1024, 512), DT) * 0.05


def fuse_now(packed):
    x1 = pool_reshape(packed[0])
    x3 = up_broadcast(packed[1])
    xc = jnp.concatenate([x1, packed[2], x3], -1)
    return jax.lax.conv_general_dilated(xc, wc, (1, 1), "VALID",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fuse_fast(packed):
    x1 = pool_dwconv(packed[0])
    x3 = up_concat(packed[1])
    xc = jnp.concatenate([x1, packed[2], x3], -1)
    return jax.lax.conv_general_dilated(xc, wc, (1, 1), "VALID",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fuse_split(packed):
    # avoid the concat: three 1x1 convs on the parts, summed
    x1 = pool_dwconv(packed[0])
    x3 = up_concat(packed[1])
    w1, w2, w3 = wc[:, :, :256], wc[:, :, 256:512], wc[:, :, 512:]
    dn = ("NHWC", "HWIO", "NHWC")
    return (jax.lax.conv_general_dilated(x1, w1, (1, 1), "VALID", dimension_numbers=dn)
            + jax.lax.conv_general_dilated(packed[2], w2, (1, 1), "VALID", dimension_numbers=dn)
            + jax.lax.conv_general_dilated(x3, w3, (1, 1), "VALID", dimension_numbers=dn))


def timeit_multi(name, fn):
    def mk(k):
        return (jax.random.uniform(jax.random.fold_in(k, 0), P3, DT),
                jax.random.uniform(jax.random.fold_in(k, 1), (B, 40, 40, 256), DT),
                jax.random.uniform(jax.random.fold_in(k, 2), P5, DT))

    xs = jax.block_until_ready(jax.tree_util.tree_map(
        lambda *a: jnp.stack(a), *[mk(jax.random.PRNGKey(i)) for i in range(R_HI)]))

    def _run2(xs_):
        def many(xs):
            def body(acc, x):
                return acc + jnp.sum(fn(x).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return acc
        jitted = jax.jit(many)
        jitted(xs_).item()
        best = float("inf")
        prev = None
        for _ in range(10):
            t0 = time.perf_counter()
            jitted(xs_).item()
            jitted(xs_).item()
            cur = (time.perf_counter() - t0) / 2
            best = min(best, cur)
            if prev is not None and abs(cur - prev) / min(cur, prev) < 0.10:
                break
            prev = cur
        return best

    lo = _run2(jax.tree_util.tree_map(lambda a: a[:R_LO], xs))
    hi = _run2(xs)
    print(f"{name:46s} {(hi - lo) / (R_HI - R_LO) * 1000:8.3f} ms", flush=True)


# NOTE: packed[1] is P4 (40,40,256): FuseModule actually upsamples P5 (20->40)
# and pools P3 (80->40); adjust: pool P3, pass P4, upsample P5
def fuse_now2(p):
    x1 = pool_reshape(p[0])
    x3 = up_broadcast(p[2])
    xc = jnp.concatenate([x1, p[1], x3], -1)
    return jax.lax.conv_general_dilated(xc, wc, (1, 1), "VALID",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fuse_fast2(p):
    x1 = pool_dwconv(p[0])
    x3 = up_concat(p[2])
    xc = jnp.concatenate([x1, p[1], x3], -1)
    return jax.lax.conv_general_dilated(xc, wc, (1, 1), "VALID",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fuse_split2(p):
    x1 = pool_dwconv(p[0])
    x3 = up_concat(p[2])
    w1, w2, w3 = wc[:, :, :256], wc[:, :, 256:512], wc[:, :, 512:]
    dn = ("NHWC", "HWIO", "NHWC")
    return (jax.lax.conv_general_dilated(x1, w1, (1, 1), "VALID", dimension_numbers=dn)
            + jax.lax.conv_general_dilated(p[1], w2, (1, 1), "VALID", dimension_numbers=dn)
            + jax.lax.conv_general_dilated(x3, w3, (1, 1), "VALID", dimension_numbers=dn))


timeit_multi("FuseModule dataflow (current ops)", fuse_now2)
timeit_multi("FuseModule dataflow (conv pool/up)", fuse_fast2)
timeit_multi("FuseModule dataflow (split conv, no concat)", fuse_split2)
