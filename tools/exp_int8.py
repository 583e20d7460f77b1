"""int8 serving probe (VERDICT r3 #8): is quantized inference a real lever?

The round-4 roofline (PROFILE.md) shows the b128 flagship step is
HBM-bandwidth-bound: 42 TFLOP/s achieved (21% bf16 MFU) while moving
~550 GB/s (~67% of v5e peak). Schedule tuning can win at most ~1.5x; the
big remaining lever is moving FEWER BYTES. int8 halves activation+weight
traffic vs bf16 and the v5e MXU runs int8 at 2x bf16 TOPS — IF XLA lowers
int8 convs onto it.

Probe: slope-time the flagship's hot conv shapes as (a) bf16 in/out (the
production path), (b) int8 weights x bf16 activations (weight-only quant:
halves weight traffic only — weights are ~20 MB total, so expect ~nothing),
(c) int8 weights x int8 activations with int32 accumulation + f32 rescale
(full quant: halves the activation streams). (c)'s rescale models per-tensor
symmetric quantization — the accuracy side is covered by the existing int8
TFLite export path (tests/test_export_roundtrip.py).

Run on the chip:  python tools/exp_int8.py [--batch 128]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

R_LO, R_HI = 2, 8


def slope_time(name, fn, make_input):
    # budget staged inputs to ~5 GB HBM (the b128@640 bf16 case is 1.7 GB/rep)
    probe = make_input(jax.random.PRNGKey(0))
    rep_bytes = sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(probe))
    r_hi = max(R_LO + 1, min(R_HI, int(5e9 // max(rep_bytes, 1))))
    xs_hi = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[make_input(jax.random.PRNGKey(i)) for i in range(r_hi)])
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
    ms = (t_hi - t_lo) / (r_hi - R_LO) * 1e3
    print(f"{name:52s} {ms:8.2f} ms  (reps {R_LO}/{r_hi})", flush=True)
    return ms


def conv(x, w, s=1, dn=("NHWC", "HWIO", "NHWC"), acc=None):
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (s, s), [(p, p), (p, p)], dimension_numbers=dn,
        preferred_element_type=acc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    b = args.batch
    print(f"# devices: {jax.devices()}  batch={b}", file=sys.stderr)

    key = jax.random.PRNGKey(0)

    # flagship hot shapes (b128@640): early high-res convs carry the bytes
    cases = [
        ("conv 3x3 s2 16->32 @640", (b, 640, 640, 16), (3, 3, 16, 32), 2),
        ("conv 3x3 s2 64->128 @160", (b, 160, 160, 64), (3, 3, 64, 128), 2),
        ("conv 3x3 128->128 @160", (b, 160, 160, 128), (3, 3, 128, 128), 1),
        ("conv 1x1 256->256 @80", (b, 80, 80, 256), (1, 1, 256, 256), 1),
        ("conv 3x3 512->512 @20", (b, 20, 20, 512), (3, 3, 512, 512), 1),
    ]
    for name, xs, ws, s in cases:
        wf = jax.random.normal(key, ws, jnp.bfloat16) * 0.05
        w8 = jnp.clip(jnp.round(wf.astype(jnp.float32) * 127 / 0.2), -127, 127
                      ).astype(jnp.int8)
        wscale = jnp.float32(0.2 / 127)

        def mk_bf16(k):
            return (jax.random.uniform(k, xs, jnp.bfloat16),)

        def mk_int8(k):
            u = jax.random.uniform(k, xs, jnp.float32) * 254 - 127
            return (u.astype(jnp.int8),)

        slope_time(f"{name} bf16xbf16",
                   lambda x, w=wf, st=s: conv(x, w, st), mk_bf16)
        slope_time(f"{name} int8-w x bf16-a (dequant w)",
                   lambda x, w=w8, st=s: conv(
                       x, (w.astype(jnp.bfloat16) * wscale.astype(jnp.bfloat16)), st),
                   mk_bf16)
        slope_time(f"{name} int8 x int8 -> i32 (+f32 rescale)",
                   lambda x, w=w8, st=s: (
                       conv(x, w, st, acc=jnp.int32).astype(jnp.float32) * wscale),
                   mk_int8)


if __name__ == "__main__":
    main()
