"""Measured HBM bandwidth ceiling (round 5, VERDICT ask #1a).

Both rooflines (PROFILE.md) priced HBM at the PAPER constant 819 GB/s and
concluded "67% / 78% of peak, chase closed" — but the stop-decision for the
whole perf program rested on an unmeasured number. This measures the
ACHIEVABLE sustained bandwidth on this chip with pure streaming kernels,
STREAM-style, slope-timed over a lax.scan to cancel the ~30 ms axon
dispatch floor (same amortization as bench.py's scan protocol):

  copy   c     = a + 1          (read 1 stream, write 1)   2 streams
  scale  c     = 0.5 * a        (read 1, write 1)          2 streams
  triad  c     = a + 0.5 * c    (read 2, write 1)          3 streams
  read   s    += sum(a)         (read 1, scalar carry)     1 stream
  write  c     = fill(s)        (write 1, scalar read)     1 stream

Hard-won methodology (this file was wrong twice):
  1. jax.block_until_ready is a NO-OP under the axon tunnel — it returns
     before remote completion (bench.py header documents the same). Sync
     by host-fetching a scalar with .item().
  2. A strided-slice consumer (`c[::n//8].sum()`) let XLA slice-propagate
     through the elementwise scan body and read only 8 lanes per trip —
     the "benchmark" reported PB/s. Reduce the FULL carry.
  3. 1-D arrays measure ~150 GB/s — a layout artifact (one giant minor
     dim). Use (rows, 8192): same bytes, ~6x the bandwidth. The model's
     tensors are all ≥2-D, so 2-D is the representative layout.

Each scan trip consumes a DISTINCT slice of a big stacked input (so no
cache/CSE effects) and the reported time is the slope
(T_hi - T_lo) / (reps_hi - reps_lo), medians over several trials.

Run on the real chip:  python tools/exp_hbm_ceiling.py [MiB per array]
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

MIB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
R_LO, R_HI = 4, 36
TRIALS = 9
PAPER_GBPS = 819.0
MINOR = 8192


def _time(jitted, *args):
    """Min wall time over TRIALS (dispatch noise through the tunnel is
    one-sided delay, so min is the right estimator for a ceiling); sync via
    host scalar fetch (.item()), NOT block_until_ready (no-op under axon —
    see module docstring)."""
    float(jitted(*args))  # compile + warm + cold-fetch path
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(jitted(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(name, make_carry, body, streams, dtype):
    n = MIB * 2**20 // jnp.dtype(dtype).itemsize
    shape = (n // MINOR, MINOR)
    key = jax.random.PRNGKey(0)
    # generate DIRECTLY in the target dtype — staging f32 then casting keeps
    # a 2x-sized f32 source live and OOMs the 16 GB chip on the bf16 round
    xs_hi = jax.random.uniform(key, (R_HI,) + shape, dtype)
    c0 = make_carry(shape, dtype)

    def many(xs, c):
        def step(c, x):
            return body(x, c), None

        c, _ = jax.lax.scan(step, c, xs)
        # consume the FULL carry (see docstring pitfall #2)
        return jnp.asarray(c, jnp.float32).sum()

    jitted = jax.jit(many)
    float(jnp.sum(xs_hi[0, :1]))  # force staging
    t_hi = _time(jitted, xs_hi, c0)
    t_lo = _time(jitted, xs_hi[:R_LO], c0)
    per_trip = (t_hi - t_lo) / (R_HI - R_LO)
    nbytes = n * jnp.dtype(dtype).itemsize
    gbps = streams * nbytes / per_trip / 1e9
    print(f"{name:22s} {jnp.dtype(dtype).name:8s} {MIB:5d} MiB x{streams} "
          f"hi={t_hi*1e3:7.2f} lo={t_lo*1e3:7.2f} {per_trip * 1e3:7.3f} ms/trip"
          f"  -> {gbps:7.1f} GB/s ({gbps / PAPER_GBPS * 100:5.1f}% of 819 paper)",
          flush=True)
    # the stacked input is R_HI * MIB (9 GB at defaults) — free it before the
    # next bench stages its own copy or the second dtype round OOMs the chip
    xs_hi.delete()
    if hasattr(c0, "delete"):
        c0.delete()
    return gbps


def arr(shape, dtype):
    return jnp.zeros(shape, dtype)


def scalar(shape, dtype):
    return jnp.zeros((), jnp.float32)


print(f"# devices={jax.devices()}", flush=True)
results = {}
for dt in (jnp.float32, jnp.bfloat16):
    nm = jnp.dtype(dt).name
    results[f"copy_{nm}"] = bench(
        "copy  c = a + 1", arr, lambda x, c: x + jnp.asarray(1, x.dtype), 2, dt)
    results[f"scale_{nm}"] = bench(
        "scale c = 0.5 * a", arr, lambda x, c: jnp.asarray(0.5, x.dtype) * x, 2, dt)
    results[f"triad_{nm}"] = bench(
        "triad c = a + 0.5 c", arr, lambda x, c: x + jnp.asarray(0.5, x.dtype) * c, 3, dt)
    results[f"read_{nm}"] = bench(
        "read  s += sum(a)", scalar,
        lambda x, c: c + x.astype(jnp.float32).sum(), 1, dt)
    results[f"write_{nm}"] = bench(
        "write c = fill(s)", arr,
        lambda x, c: jnp.full(x.shape, x[0, 0], x.dtype), 1, dt)

best = max(results.values())
print(f"# best sustained: {best:.1f} GB/s = {best / PAPER_GBPS * 100:.1f}% of the "
      f"819 GB/s paper constant -> use THIS as the roofline ceiling")
