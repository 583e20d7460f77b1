"""On-chip A/B of the fused preprocessing paths (VERDICT r2 #3: the Pallas
kernel must run NON-interpret on the real TPU; this measures it against its
XLA twin and the separable one-hot-matmul variant at the bench's e2e shape).

Paths at (B, 512, 768) uint8 → (640, 640) f32, scaleup=False:
  pallas   kernels/preprocess.letterbox_normalize (interpret=False)
  xla      letterbox_normalize_xla (jax.image.resize two-pass)
  onehot   letterbox_normalize_onehot (two MXU matmuls)

Prints parity (max |Δ| vs xla) and slope-timed ms/batch for each; pallas
failures to lower are caught and reported, not fatal (the dispatcher can
then prefer the winner).

Usage: python tools/exp_preprocess.py [batch=128]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dbl_tpu.kernels.preprocess import (
    letterbox_normalize,
    letterbox_normalize_onehot,
    letterbox_normalize_xla,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IN_HW, OUT = (512, 768), (640, 640)
N_STAGED = 6


def slope_time(fn, xs, reps_hi=10, reps_lo=2):
    """(T_hi - T_lo) / (hi - lo): cancels the per-dispatch tunnel floor."""
    def run(reps):
        t0 = time.perf_counter()
        for i in range(reps):
            jax.block_until_ready(fn(xs[i % len(xs)]))
        return time.perf_counter() - t0

    run(2)  # warm
    return (run(reps_hi) - run(reps_lo)) / (reps_hi - reps_lo)


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(0)
    xs = [jax.block_until_ready(jnp.asarray(
        rng.integers(0, 255, (B, *IN_HW, 3), dtype=np.uint8))) for _ in range(N_STAGED)]

    fns = {
        "xla": jax.jit(lambda u: letterbox_normalize_xla(u, OUT, scaleup=False)),
        "onehot": jax.jit(lambda u: letterbox_normalize_onehot(u, OUT, scaleup=False)),
        "pallas": jax.jit(lambda u: letterbox_normalize(u, OUT, scaleup=False)),
    }
    ref = np.asarray(fns["xla"](xs[0]))
    for name, fn in fns.items():
        try:
            out = np.asarray(jax.block_until_ready(fn(xs[0])))
            delta = float(np.abs(out - ref).max())
            ms = slope_time(fn, xs) * 1e3
            print(f"{name:8s} max|Δ| vs xla = {delta:.2e}   {ms:8.3f} ms/batch "
                  f"({B / (ms / 1e3):8.1f} img/s)")
        except Exception as e:  # noqa: BLE001 — report which path can't lower
            print(f"{name:8s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
