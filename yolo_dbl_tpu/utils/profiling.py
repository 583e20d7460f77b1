"""Profiling: stage timers, per-layer profiling, FLOPs, device traces.

Equivalents of the reference's profiling machinery (SURVEY.md §5):
  * `Profile` — context-decorator timer with device sync (utils/ops.py:17);
  * `profile_layers` — per-layer time/FLOPs table
    (BaseModel._profile_one_layer, nn/tasks.py:185-205);
  * `get_flops` — analytic FLOPs from the compiled HLO cost analysis
    (replaces thop, utils/torch_utils.py:364);
  * `trace` — jax.profiler device trace capture (replaces torch.profiler).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp


class Profile(contextlib.ContextDecorator):
    """Accumulating timer with device synchronization (reference ops.py:17)."""

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        jax.effects_barrier()
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        jax.effects_barrier()
        self.dt = time.perf_counter() - self.start
        self.t += self.dt
        return False

    def __str__(self):
        return f"{self.t:.6f}s"


def get_flops(fn: Callable, *args) -> Optional[float]:
    """FLOPs of a jitted callable from XLA cost analysis (thop replacement)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:  # noqa: BLE001 — backend-dependent introspection
        return None


def memory_analysis(fn: Callable, *args) -> Optional[Dict[str, int]]:
    """Compiled-program memory footprint (argument/output/temp/generated)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        m = compiled.memory_analysis()
        return {
            "argument_bytes": m.argument_size_in_bytes,
            "output_bytes": m.output_size_in_bytes,
            "temp_bytes": m.temp_size_in_bytes,
            "generated_code_bytes": m.generated_code_size_in_bytes,
        }
    except Exception:  # noqa: BLE001
        return None


def profile_layers(model, variables, x, repeat: int = 10) -> List[Dict[str, Any]]:
    """Per-layer timing by incremental prefix execution (the jit analogue of
    the reference's per-layer hook timing, tasks.py:185): time the jitted
    prefix up to layer i and report the delta."""
    rows = []
    spec = model.spec
    prev = 0.0
    for i in range(len(spec.layers)):
        prefix_spec = type(spec)(
            layers=spec.layers[: i + 1], save=spec.save, nc=spec.nc, scale=spec.scale
        )
        # reuse the same module but stop after layer i via a sliced spec copy
        from ..nn.tasks import YOLOModel

        sub = YOLOModel(spec=prefix_spec, dtype=model.dtype)
        try:
            fn = jax.jit(lambda v, xx: sub.apply(v, xx))
            out = fn(variables, x)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(repeat):
                out = fn(variables, x)
            jax.block_until_ready(out)
            total = (time.perf_counter() - t0) / repeat
        except Exception as e:  # noqa: BLE001
            rows.append({"layer": i, "name": spec.layers[i].name, "error": str(e)[:80]})
            continue
        rows.append(
            {"layer": i, "name": spec.layers[i].name, "cumulative_s": total, "delta_s": total - prev}
        )
        prev = total
    return rows


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """Device trace capture viewable in TensorBoard/Perfetto (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def autobatch(make_fn: Callable[[int], Callable], example_batch: Callable[[int], Any],
              hbm_bytes: int = 16 * 1024**3, fraction: float = 0.6,
              candidates=(1, 2, 4, 8, 16, 32, 64, 128)) -> int:
    """Pick the largest batch whose compiled memory fits `fraction` of HBM.

    Reference utils/autobatch.py profiles CUDA memory at runtime; on TPU the
    compiled program's memory footprint is known statically, so this is a
    compile-time binary fit with no OOM risk.
    """
    best = candidates[0]
    budget = hbm_bytes * fraction
    for b in candidates:
        m = memory_analysis(make_fn(b), example_batch(b))
        if m is None:
            break
        need = m["argument_bytes"] + m["output_bytes"] + m["temp_bytes"]
        if need <= budget:
            best = b
        else:
            break
    return best
