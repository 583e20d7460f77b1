"""Slope-timed micro-benchmarks: time scan(reps=2) and scan(reps=10) over
distinct inputs, report (T10-T2)/8 — cancels the ~30 ms axon dispatch floor
that drowned the previous micro readings."""
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


def timeit(name, fn, params, make_x, hbm_budget_gb=3.5):
    import numpy as np
    probe = make_x(jax.random.PRNGKey(0))
    bytes_hi = probe.size * probe.dtype.itemsize * R_HI / 1e9
    r_hi = R_HI if bytes_hi < hbm_budget_gb else max(R_LO + 2, int(hbm_budget_gb / (probe.size * probe.dtype.itemsize / 1e9)))
    xs_hi = jnp.stack([make_x(jax.random.PRNGKey(i)) for i in range(r_hi)])
    xs_lo = xs_hi[:R_LO]
    params = jax.block_until_ready(jax.device_put(params))
    xs_hi = jax.block_until_ready(xs_hi)
    t_lo = _run(fn, params, xs_lo)
    t_hi = _run(fn, params, xs_hi)
    ms = (t_hi - t_lo) / (r_hi - R_LO) * 1000
    print(f"{name:46s} {ms:8.2f} ms  {B/(ms/1000):8.1f} img/s", flush=True)
    return ms


key = jax.random.PRNGKey(0)

# p1 conv
mk16 = lambda k: jax.random.uniform(k, (B, 640, 640, 16), DT)
mod = Conv(32, 3, 2, dtype=DT)
v = mod.init(key, jnp.zeros((1, 640, 640, 16), DT))
timeit("Conv module 16->32 s2 @640", lambda p, xx: mod.apply(p, xx), v, mk16)

w = jax.random.normal(key, (3, 3, 16, 32), DT) * 0.1
timeit("raw conv+silu 16->32 s2 @640", lambda ww, xx: jax.nn.silu(
    jax.lax.conv_general_dilated(xx, ww, (2, 2), ((1, 1), (1, 1)),
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))), w, mk16)

# stem
mk3 = lambda k: jax.random.uniform(k, (B, 640, 640, 3), DT)
mod3 = Conv(16, 3, 1, dtype=DT)
v3 = mod3.init(key, jnp.zeros((1, 640, 640, 3), DT))
timeit("Conv module 3->16 s1 @640 (stem)", lambda p, xx: mod3.apply(p, xx), v3, mk3)

# full stack of first 5 layers (s-scale): stem,p1conv,bneck,p2conv,bneck
from yolo_dbl_tpu.nn.blocks import Bottleneck


def seq(mods, in_shape):
    class Seq:
        def init(self, key):
            x = jnp.zeros(in_shape, DT)
            vs = []
            for m in mods:
                vv = m.init(key, x)
                x = m.apply(vv, x)
                vs.append(vv)
            return vs

        def apply(self, vs, x):
            for m, vv in zip(mods, vs):
                x = m.apply(vv, x)
            return x

    return Seq()


s5 = seq([Conv(16, 3, 1, dtype=DT), Conv(32, 3, 2, dtype=DT), Bottleneck(32, dtype=DT),
          Conv(64, 3, 2, dtype=DT), Bottleneck(64, dtype=DT)], (1, 640, 640, 3))
vs5 = s5.init(key)
timeit("layers0-4 (stem..p2bneck)", lambda p, xx: s5.apply(p, xx), vs5, mk3)

# hyperace at real shapes, slope-timed
from yolo_dbl_tpu.nn.blocks import HyperACE

hx = HyperACE(512, 256, n=1, num_hyperedges=8, dsc3k=True, shortcut=False,
              e1=0.5, e2=1, context="both", channel_adjust=True, dtype=DT)
shapes = [(B, 80, 80, 256), (B, 40, 40, 256), (B, 20, 20, 512)]
vh = hx.init(key, [jnp.zeros(s, DT) for s in shapes])


def mkh(k):
    flat = [jax.random.uniform(jax.random.fold_in(k, i), s, DT).reshape(-1) for i, s in enumerate(shapes)]
    return jnp.concatenate(flat)


def apply_packed(p, packed):
    xs, o = [], 0
    for s in shapes:
        n = 1
        for d in s:
            n *= d
        xs.append(packed[o:o + n].reshape(s))
        o += n
    return hx.apply(p, xs)


timeit("hyperace (real shapes)", apply_packed, vh, mkh)

# NMS slope-timed
from yolo_dbl_tpu.ops.nms import non_max_suppression


def mkpred(k):
    p = jax.random.uniform(k, (B, 7, 8400), jnp.float32)
    return jnp.concatenate([p[:, :4] * 640, p[:, 4:] * 0.6], axis=1)


timeit("nms K=1024", lambda _, pred: non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45, max_det=300)[0],
       jnp.zeros(()), mkpred)
timeit("nms K=512", lambda _, pred: non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45, max_det=300, pre_nms_topk=512)[0],
       jnp.zeros(()), mkpred)
