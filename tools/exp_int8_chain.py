"""int8-DOMAIN chain probe (round 5, VERDICT stretch #8).

The round-4 int8 e2e NO-GO's own analysis (PROFILE.md) says the win needs
the int8 domain carried END-TO-END through conv->BN->SiLU->requantize
chains with int8 shortcut arithmetic — so the activation STREAMS between
convs halve, instead of adding a quantize pass next to a bf16 tensor that
materializes anyway.

This tests that hypothesis at minimum cost on the P3 hot segment (backbone
layer 6: 8x Bottleneck(256) @ 80x80, the largest contiguous residual chain
in the flagship) in three arms, all plain XLA (Pallas only becomes
justified if XLA refuses to keep int8 in HBM between blocks — check the
compiled HLO, printed):

  bf16   : x -> [conv3x3 -> SiLU -> conv3x3 -> SiLU -> +res] x N     (baseline)
  int8e2e: int8 x -> [conv(i8xi8->i32) -> f32 scale+SiLU -> requant i8
                       -> conv -> ... -> residual add in f32 epilogue
                       -> requant i8] x N                  (the hypothesis)
  int8mix: round-4 composition mode for reference — int8 convs but bf16
           tensors still materialized between blocks (quantize as ADDED
           traffic).

BN is folded (serving form). Residual adds happen in the f32 epilogue
before the requantize (two int8 operands at different scales cannot be
added in int8 without a shared-scale requant anyway) — the add fuses into
the conv epilogue, so no extra HBM pass.

Slope-timed over lax.scan with distinct pre-staged inputs (bench.py
protocol; host-fetch sync — block_until_ready is a no-op under axon).

Run on the real chip: python tools/exp_int8_chain.py [batch] [n_blocks]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N_BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H = W = 80
C = 256
R_LO, R_HI = 2, 6
TRIALS = 3


def _time(jitted, *args):
    out = jitted(*args)
    float(jnp.asarray(out).ravel()[0])  # compile + warm
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        out = jitted(*args)
        float(jnp.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope(fn, xs_hi, xs_lo):
    j = jax.jit(fn)
    t_hi = _time(j, xs_hi)
    t_lo = _time(j, xs_lo)
    return (t_hi - t_lo) / (R_HI - R_LO)


def conv_bf16(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jax.nn.silu(y).astype(jnp.bfloat16)


def conv_i8(x_i8, w_i8, sx, sw):
    """int8 x int8 -> int32 accumulate; f32 scale + SiLU in the epilogue."""
    y = jax.lax.conv_general_dilated(
        x_i8, w_i8, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return jax.nn.silu(y.astype(jnp.float32) * (sx * sw))


def requant(y_f32, s):
    return jnp.clip(jnp.round(y_f32 / s), -127, 127).astype(jnp.int8)


def main():
    rng = np.random.default_rng(0)
    # weights: N blocks x 2 convs each
    ws = [rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05
          for _ in range(2 * N_BLOCKS)]
    ws_bf16 = [jnp.asarray(w, jnp.bfloat16) for w in ws]
    # symmetric per-tensor int8 weights (per-channel changes nothing for BW)
    w_scales = [np.abs(w).max() / 127.0 for w in ws]
    ws_i8 = [jnp.asarray(np.clip(np.round(w / s), -127, 127), jnp.int8)
             for w, s in zip(ws, w_scales)]
    SA = 4.0 / 127.0  # shared activation scale (traffic probe; accuracy n/a)

    def chain_bf16(x):
        for i in range(N_BLOCKS):
            y = conv_bf16(x, ws_bf16[2 * i])
            y = conv_bf16(y, ws_bf16[2 * i + 1])
            x = x + y
        return x.astype(jnp.float32).sum()

    def chain_i8_e2e(x_i8):
        # int8 in HBM between every op; residual carried as int8 too, added
        # in the f32 epilogue (same scale -> exact), requantized once
        for i in range(N_BLOCKS):
            y = conv_i8(x_i8, ws_i8[2 * i], SA, w_scales[2 * i])
            y1_i8 = requant(y, SA)
            y2 = conv_i8(y1_i8, ws_i8[2 * i + 1], SA, w_scales[2 * i + 1])
            res = y2 + x_i8.astype(jnp.float32) * SA
            x_i8 = requant(res, SA)
        return x_i8.astype(jnp.float32).sum()

    def chain_i8_mix(x):
        # round-4 composition mode: bf16 tensors live between blocks,
        # quantize is added traffic
        for i in range(N_BLOCKS):
            x_i8 = requant(x.astype(jnp.float32), SA)
            y = conv_i8(x_i8, ws_i8[2 * i], SA, w_scales[2 * i])
            y1_i8 = requant(y, SA)
            y2 = conv_i8(y1_i8, ws_i8[2 * i + 1], SA, w_scales[2 * i + 1])
            x = (x.astype(jnp.float32) + y2).astype(jnp.bfloat16)
        return x.astype(jnp.float32).sum()

    def scanned(body):
        def fn(xs):
            def step(c, x):
                return c + body(x), None
            c, _ = jax.lax.scan(step, jnp.float32(0), xs)
            return c
        return fn

    print(f"# chain: {N_BLOCKS}x Bottleneck({C}) @ {H}x{W}, b{B} "
          f"({2 * N_BLOCKS} convs), devices={jax.devices()}", flush=True)
    # inputs generated ON DEVICE: the (R_HI,B,H,W,C) block is multi-GB at
    # f32 — materializing it on the host and shipping it through the axon
    # tunnel dominates wall-clock and starves the probe's timeout
    key = jax.random.PRNGKey(0)
    xs_bf16 = jax.jit(
        lambda k: jax.random.normal(k, (R_HI, B, H, W, C), jnp.bfloat16))(key)
    xs_i8 = jax.jit(lambda x: jnp.clip(
        jnp.round(x.astype(jnp.float32) / SA), -127, 127).astype(jnp.int8))(
        xs_bf16)
    xs_bf16.block_until_ready()

    t_bf16 = slope(scanned(chain_bf16), xs_bf16, xs_bf16[:R_LO])
    print(f"bf16 chain       : {t_bf16 * 1e3:8.2f} ms  1.00x", flush=True)
    t_e2e = slope(scanned(chain_i8_e2e), xs_i8, xs_i8[:R_LO])
    print(f"int8 END-TO-END  : {t_e2e * 1e3:8.2f} ms  {t_bf16 / t_e2e:.2f}x",
          flush=True)
    t_mix = slope(scanned(chain_i8_mix), xs_bf16, xs_bf16[:R_LO])
    print(f"int8 mixed (r4)  : {t_mix * 1e3:8.2f} ms  {t_bf16 / t_mix:.2f}x",
          flush=True)

    # does XLA actually keep int8 in HBM between blocks? count the s8 vs
    # bf16/f32 tensors materialized at the top level of the e2e program
    hlo = jax.jit(scanned(chain_i8_e2e)).lower(xs_i8).compile().as_text()
    import re

    s8 = len(re.findall(r"= s8\[", hlo))
    f32b = len(re.findall(r"= (?:f32|bf16)\[\d", hlo))
    print(f"# e2e HLO: {s8} s8-result instrs vs {f32b} f32/bf16-result instrs "
          f"(int8 domain held iff s8 dominates the big tensors)")


if __name__ == "__main__":
    main()
