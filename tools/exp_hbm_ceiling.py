"""Measured HBM bandwidth ceiling (round 5, VERDICT ask #1a).

Both rooflines (PROFILE.md) priced HBM at the PAPER constant 819 GB/s and
concluded "67% / 78% of peak, chase closed" — but the stop-decision for the
whole perf program rested on an unmeasured number. This measures the
ACHIEVABLE sustained bandwidth on this chip with pure streaming kernels,
STREAM-style, slope-timed over a lax.scan to cancel the ~30 ms axon
dispatch floor (same protocol as tools/exp_slope.py):

  copy   c     = a + 1          (read 1 stream, write 1)   2 streams
  scale  c     = 0.5 * a        (read 1, write 1)          2 streams
  triad  c     = a + 0.5 * c    (read 2, write 1)          3 streams
  read   s    += sum(a)         (read 1, write ~0)         1 stream

Each scan trip consumes a DISTINCT slice of a big stacked input (so no
cache/CSE effects), carries the output tensor (so the write stream is
real), and the reported time is (T_hi - T_lo) / (reps_hi - reps_lo).

Run on the real chip:  python tools/exp_hbm_ceiling.py [MiB per array]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

MIB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
R_LO, R_HI = 2, 12
PAPER_GBPS = 819.0


def _time(jitted, *args):
    jax.block_until_ready(jitted(*args))  # compile + warm
    best = float("inf")
    prev = None
    for _ in range(12):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(*args))
        jax.block_until_ready(jitted(*args))
        cur = (time.perf_counter() - t0) / 2
        best = min(best, cur)
        if prev is not None and abs(cur - prev) / min(cur, prev) < 0.05:
            break
        prev = cur
    return best


def bench(name, body, streams, dtype):
    n = MIB * 2**20 // jnp.dtype(dtype).itemsize
    key = jax.random.PRNGKey(0)
    xs_hi = jax.random.uniform(key, (R_HI, n), jnp.float32).astype(dtype)
    c0 = jnp.zeros((n,), dtype)

    def many(xs, c):
        def step(c, x):
            return body(x, c), None

        c, _ = jax.lax.scan(step, c, xs)
        # consume the carry so the final write can't be DCE'd
        return c[::max(n // 8, 1)].astype(jnp.float32).sum()

    jitted = jax.jit(many)
    xs_hi = jax.block_until_ready(xs_hi)
    t_hi = _time(jitted, xs_hi, c0)
    t_lo = _time(jitted, xs_hi[:R_LO], c0)
    per_trip = (t_hi - t_lo) / (R_HI - R_LO)
    nbytes = n * jnp.dtype(dtype).itemsize
    gbps = streams * nbytes / per_trip / 1e9
    print(f"{name:24s} {jnp.dtype(dtype).name:8s} {MIB:5d} MiB x{streams} streams "
          f"{per_trip * 1e3:8.3f} ms/trip  -> {gbps:7.1f} GB/s "
          f"({gbps / PAPER_GBPS * 100:5.1f}% of the 819 paper number)", flush=True)
    return gbps


print(f"# devices={jax.devices()}", flush=True)
results = {}
for dt in (jnp.float32, jnp.bfloat16):
    results[f"copy_{jnp.dtype(dt).name}"] = bench(
        "copy  c = a + 1", lambda x, c: x + jnp.asarray(1, x.dtype), 2, dt)
    results[f"scale_{jnp.dtype(dt).name}"] = bench(
        "scale c = 0.5 * a", lambda x, c: jnp.asarray(0.5, x.dtype) * x, 2, dt)
    results[f"triad_{jnp.dtype(dt).name}"] = bench(
        "triad c = a + 0.5 * c", lambda x, c: x + jnp.asarray(0.5, x.dtype) * c, 3, dt)
    results[f"read_{jnp.dtype(dt).name}"] = bench(
        "read  c[0] += sum(a)",
        lambda x, c: c.at[0].add(x.astype(jnp.float32).sum().astype(x.dtype)), 1, dt)

best = max(results.values())
print(f"# best sustained: {best:.1f} GB/s = {best / PAPER_GBPS * 100:.1f}% of the "
      f"819 GB/s paper constant -> use THIS as the roofline ceiling")
