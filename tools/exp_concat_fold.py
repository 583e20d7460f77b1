"""Concat-fold: does conv1x1(concat(parts)) pay for the concat on TPU? (round 4)

The inference roofline (PROFILE.md) shows the b128 step bandwidth-bound at
~67% of peak HBM with the MXU mostly idle; remaining wins must REDUCE
traffic. The flagship trunk is CSP/ELAN-structured: nearly every block ends
with `Conv1x1(concat(y0, y1, ..., yn))` (reference C3k2/DSC3k2/ELAN cv2,
ultralytics nn/modules/block.py). If XLA materializes the concat output in
HBM before the conv reads it back, that is 2 full passes of a
(B, H, W, sum_c) tensor per site — ~0.8 GB at (128, 80, 80, 512) bf16.

The fold is exact linear algebra: a conv over a channel-concat equals the
sum of convs on the parts with the weight sliced along the input-channel
axis:

    conv(concat(a, b), W) == conv(a, W[..., :ca, :]) + conv(b, W[..., ca:, :])

The add fuses into the second conv's epilogue; the concat tensor never
exists. This experiment measures both forms (and a 3x3-kernel variant) at
the flagship's hot shapes to decide whether XLA already does this rewrite.

Run on the chip:  python tools/exp_concat_fold.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

R_LO, R_HI = 2, 8
B = 128


def slope_time(name, fn, make_input):
    xs_hi = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[make_input(jax.random.PRNGKey(i)) for i in range(R_HI)])
    xs_hi = jax.block_until_ready(xs_hi)
    xs_lo = jax.tree_util.tree_map(lambda l: l[:R_LO], xs_hi)

    def many(xs):
        def body(acc, x):
            out = fn(*x)
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves(out)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jit = jax.jit(many)

    def best_of(xs, tries=5):
        jit(xs).item()
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            jit(xs).item()
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_of(xs_lo)
    t_hi = best_of(xs_hi)
    ms = (t_hi - t_lo) / (R_HI - R_LO) * 1e3
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def silu_bn(y, scale, bias):
    y = y * scale + bias
    return y * jax.nn.sigmoid(y)


def run_case(tag, hw, parts, cout, k):
    """parts: list of channel widths entering the concat."""
    h = w_ = hw
    cin = sum(parts)
    key = jax.random.PRNGKey(0)
    wfull = jax.random.normal(key, (k, k, cin, cout), jnp.bfloat16) * 0.05
    scale = jnp.ones((cout,), jnp.bfloat16)
    bias = jnp.zeros((cout,), jnp.bfloat16)
    splits = []
    off = 0
    for c in parts:
        splits.append(wfull[:, :, off:off + c, :])
        off += c

    def mk(key):
        ks = jax.random.split(key, len(parts))
        return tuple(jax.random.normal(kk, (B, h, w_, c), jnp.bfloat16)
                     for kk, c in zip(ks, parts))

    def concat_form(*xs):
        y = conv(jnp.concatenate(xs, axis=-1), wfull)
        return silu_bn(y, scale, bias)

    def fold_form(*xs):
        y = conv(xs[0], splits[0])
        for xp, wp in zip(xs[1:], splits[1:]):
            y = y + conv(xp, wp)
        return silu_bn(y, scale, bias)

    # parity
    xs = mk(jax.random.PRNGKey(7))
    a = jax.jit(concat_form)(*xs)
    b = jax.jit(fold_form)(*xs)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    t_cat = slope_time(f"{tag} concat+conv{k}x{k}", concat_form, mk)
    t_fold = slope_time(f"{tag} split-weight sum   (err {err:.1e})", fold_form, mk)
    return t_cat, t_fold


def main():
    print(f"# devices: {jax.devices()}  b{B} bf16 slope({R_LO},{R_HI})",
          file=sys.stderr)
    cases = {
        # flagship hot concat sites (NHWC, per-level):
        "a": ("80x80  2x128->256 ", 80, [128, 128], 256, 1),
        "b": ("80x80  4x128->256 ", 80, [128] * 4, 256, 1),
        "c": ("40x40  4x256->512 ", 40, [256] * 4, 512, 1),
        "d": ("20x20  2x512->512 ", 20, [512, 512], 512, 1),
        # FuseModule-style mixed-width concat into 1x1
        "e": ("40x40  256+256+512", 40, [256, 256, 512], 256, 1),
        # 3x3 consumer (bottleneck cv2 after concat in some ELAN variants)
        "f": ("80x80  2x128->256 ", 80, [128, 128], 256, 3),
    }
    keys = sys.argv[1] if len(sys.argv) > 1 else "abcdef"
    for kk in keys:
        run_case(*cases[kk])


if __name__ == "__main__":
    main()
