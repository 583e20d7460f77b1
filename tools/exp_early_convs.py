"""Experiments: why are the 640x640 early convs 6-12x off speed-of-light?

Hypo: NHWC with C in {3,16,32} wastes the 128-lane minor dim on loads.
Try: (a) as-is; (b) space-to-depth phase rewrite of stride-2 convs
(exact k3s2 == k2s1 over 4-phase split); (c) fp32 vs bf16; (d) batch in
channel trick. Measured on the real chip, same harness rules as
profile_components.py.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

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
    ms = best / reps * 1000
    print(f"{name:42s} {ms:8.2f} ms  {B/(best/reps):9.1f} img/s", flush=True)
    return ms


def conv(x, w, stride=1, dilation=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )


key = jax.random.PRNGKey(0)

# ---- stem: 3 -> 16, k3 s1 @ 640
x3 = jax.random.uniform(key, (B, 640, 640, 3), DT)
w_stem = jax.random.normal(key, (3, 3, 3, 16), DT) * 0.1
timeit("stem 3->16 k3s1 @640 (as-is)", lambda x, w: jax.nn.silu(conv(x, w)), x3, w_stem)

# (b) pad input channels to 8
x8 = jnp.pad(x3, ((0, 0), (0, 0), (0, 0), (0, 5)))
w8 = jnp.pad(w_stem, ((0, 0), (0, 0), (0, 5), (0, 0)))
timeit("stem 8->16 k3s1 @640 (pad C)", lambda x, w: jax.nn.silu(conv(x, w)), x8, w8)

# ---- p1 conv: 16 -> 32, k3 s2 @ 640
x16 = jax.random.uniform(key, (B, 640, 640, 16), DT)
w_p1 = jax.random.normal(key, (3, 3, 16, 32), DT) * 0.1
timeit("p1 16->32 k3s2 @640 (as-is)", lambda x, w: jax.nn.silu(conv(x, w, 2)), x16, w_p1)


def s2d_conv_k3s2(x, w):
    """Exact k3 s2 'SAME' conv via 4-phase space-to-depth.

    y[i,j] = sum_{di,dj in 0..2} x[2i+di-1, 2j+dj-1] w[di,dj]
    Split x into even/odd phases and w into its phase components; each
    output is a sum of k<=2 convs on half-resolution phase images.
    """
    b, h, w_, c = x.shape
    # pad 1 on each side (SAME for k3 s2 with odd size handling: h even)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # phases of the padded input: xp[a::2, b::2]
    ph = {(a, c2): xp[:, a::2, c2::2, :] for a in (0, 1) for c2 in (0, 1)}
    # output y[i,j] = sum_{di,dj} xp[2i+di, 2j+dj] w[di,dj]
    # phase of (2i+di): parity di%2, index i + di//2
    out = None
    for di in range(3):
        for dj in range(3):
            pa, ia = di % 2, di // 2
            pb, ib = dj % 2, dj // 2
            p = ph[(pa, pb)]
            # need p[i+ia, j+ib] for i in 0..H/2-1 → slice with offset, pad end
            sl = p[:, ia : ia + h // 2 + 1, ib : ib + w_ // 2 + 1, :]
            sl = sl[:, : h // 2, : w_ // 2, :]
            term = jnp.einsum("bhwc,co->bhwo", sl, w[di, dj])
            out = term if out is None else out + term
    return out


y_ref = conv(x16, w_p1, 2)
y_new = s2d_conv_k3s2(x16, w_p1)
print("s2d exactness:", float(jnp.abs(y_ref.astype(jnp.float32) - y_new.astype(jnp.float32)).max()))
timeit("p1 16->32 k3s2 @640 (s2d 9 einsums)", lambda x, w: jax.nn.silu(s2d_conv_k3s2(x, w)), x16, w_p1)


def s2d_conv_packed(x, w):
    """k3s2 conv as ONE conv on the 4-phase space-to-depth input:
    x (B,H,W,C) -> xs2d (B,H/2,W/2,4C); y = conv_k2s1(xs2d, w'), where w'
    scatters the 3x3 taps into a 2x2 kernel over the 4C phase channels."""
    b, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))[:, :-1, :-1, :]  # (B,H+1,W+1) -> crop to even
    # build (B, H/2+?, ...) 4-phase: use H+2 padded then reshape trick
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B,H+2,W+2,C)
    e = xp[:, : (h + 2) // 2 * 2, : (ww + 2) // 2 * 2, :]
    s2d = e.reshape(b, (h + 2) // 2, 2, (ww + 2) // 2, 2, c)
    s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h + 2) // 2, (ww + 2) // 2, 4 * c)
    # kernel: out[i,j] needs taps at abs positions (2i+di, 2j+dj), di,dj in 0..2
    # s2d cell (I,J) holds abs (2I+a, 2J+b) for a,b in {0,1}
    # abs (2i+di) -> I = i + di//2... di in {0,1,2} → I-i in {0,1}: k2 kernel
    wk = jnp.zeros((2, 2, 4 * c, w.shape[-1]), w.dtype)
    for di in range(3):
        for dj in range(3):
            I, a = di // 2, di % 2
            J, bb = dj // 2, dj % 2
            ch = (a * 2 + bb)  # phase order in reshape: (2,2) dims a,b
            wk = wk.at[I, J, ch * c : (ch + 1) * c, :].add(w[di, dj])
    y = jax.lax.conv_general_dilated(
        s2d, wk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y


y_new2 = s2d_conv_packed(x16, w_p1)
print("s2d-packed shapes", y_ref.shape, y_new2.shape)
print("s2d-packed exactness:", float(jnp.abs(y_ref.astype(jnp.float32) - y_new2.astype(jnp.float32)).max()))
timeit("p1 16->32 k3s2 @640 (s2d packed conv)", lambda x, w: jax.nn.silu(s2d_conv_packed(x, w)), x16, w_p1)

# fp32 comparison for the same conv
timeit("p1 16->32 k3s2 @640 (fp32)",
       lambda x, w: jax.nn.silu(conv(x, w, 2)), x16.astype(jnp.float32), w_p1.astype(jnp.float32))

# ---- bottleneck @320x320x32: two k3 convs
x320 = jax.random.uniform(key, (B, 320, 320, 32), DT)
wa = jax.random.normal(key, (3, 3, 32, 16), DT) * 0.1
wb = jax.random.normal(key, (3, 3, 16, 32), DT) * 0.1
timeit("bneck32 @320 (2 convs)", lambda x, a, b_: x + jax.nn.silu(conv(jax.nn.silu(conv(x, a)), b_)), x320, wa, wb)
