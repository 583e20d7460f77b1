"""Decompose DSC3k2's backward cost (round-4 follow-up to exp_depthwise.py).

exp_depthwise.py refuted the grouped-conv-wgrad hypothesis on the real chip
(2026-08-19): XLA's grouped depthwise fwd+bwd costs 0.1-0.4 ms at every hot
shape — 8-20x FASTER than the shift-multiply form. So DSC3k2@80's 22.1 ms
backward (b16, tools/exp_train_breakdown.py round 3) is NOT the depthwise
taps. This experiment slope-times the grad of each constituent at the same
shape to find where it actually goes: the 1x1 pointwise matmuls, the
BatchNorms (f32 batch-stats passes over bf16 activations), the residual/
concat structure, or sheer module count (DSC3k2 n=4 dsc3k=True contains 16
DSConvs = 16 BNs + 16 pw convs + 16 dw convs plus 14 wrapper Convs).

Run on the real chip:  python tools/exp_dsc3k2.py [--batch 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

DT = jnp.bfloat16
R_LO, R_HI = 2, 8


def time_grad(name, mod, shape, extra=()):
    """Slope-timed value_and_grad of a flax module at `shape`."""
    key = jax.random.PRNGKey(0)
    xz = jnp.zeros(shape, DT)
    v = mod.init(key, xz, *extra)

    def loss(p, x):
        out = mod.apply(p, x, *extra)
        return jnp.sum(out.astype(jnp.float32))

    g = jax.grad(loss)

    xs_hi = jnp.stack([jax.random.uniform(jax.random.PRNGKey(i), shape, DT)
                       for i in range(R_HI)])
    xs_hi = jax.block_until_ready(xs_hi)
    xs_lo = xs_hi[:R_LO]

    def many(p, xs):
        def body(acc, x):
            gr = g(p, x)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves(gr)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jit = jax.jit(many)

    def best_of(xs, tries=5):
        jit(v, xs).item()
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            jit(v, xs).item()
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_of(xs_lo)
    t_hi = best_of(xs_hi)
    ms = (t_hi - t_lo) / (R_HI - R_LO) * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    b = args.batch
    print(f"# devices: {jax.devices()}  batch={b}", file=sys.stderr)

    from flax import linen as nn

    from yolo_dbl_tpu.nn import blocks as B
    from yolo_dbl_tpu.nn.common import BN_EPS, BN_MOMENTUM, Conv, DSConv

    s80 = (b, 80, 80, 128)

    # the full block, then its pieces at the in-model shape
    time_grad("DSC3k2(256,n=4,dsc3k) @80", B.DSC3k2(256, n=4, dsc3k=True, dtype=DT),
              (b, 80, 80, 256))
    time_grad("DSC3k(128,n=2) @80", B.DSC3k(128, n=2, e=1.0, dtype=DT), s80)
    time_grad("DSBottleneck(128) @80", B.DSBottleneck(128, e=1.0, dtype=DT), s80)
    time_grad("DSConv(128,k3) @80", DSConv(128, 3, dtype=DT), s80)
    time_grad("DSConv(128,k7) @80", DSConv(128, 7, dtype=DT), s80)
    time_grad("Conv(128,1x1)+BN+SiLU @80", Conv(128, 1, dtype=DT), s80)

    # isolate BN train-mode cost (batch stats fwd + bwd) — written as the
    # pure math rather than nn.BatchNorm so grad-of-apply needs no mutable
    # batch_stats collection
    class BNOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=(0, 1, 2))
            var = xf.var(axis=(0, 1, 2))
            y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
            return y.astype(x.dtype)

    time_grad("BatchNorm(train-math) @80x128", BNOnly(), s80)

    # isolate the raw pointwise matmul (no BN/act)
    class PWOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(128, (1, 1), use_bias=False, dtype=DT)(x)

    time_grad("raw pw 128->128 @80", PWOnly(), s80)

    # raw depthwise, already known cheap — rebaseline in this harness
    class DWOnly(nn.Module):
        k: int = 5

        @nn.compact
        def __call__(self, x):
            p = self.k // 2
            return nn.Conv(128, (self.k, self.k), padding=[(p, p), (p, p)],
                           feature_group_count=128, use_bias=False, dtype=DT)(x)

    time_grad("raw dw k5 @80x128", DWOnly(), s80)


if __name__ == "__main__":
    main()
