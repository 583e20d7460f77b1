"""Per-module micro-benchmark harness.

TPU-native equivalent of the reference's root test.py (test.py:9
upsample_test / :42 attention_test) + global_utils/tools.py:110-128
avg_time/check_time: every pool module is timed with warmup + N jitted
iterations and device synchronization. Same canonical inputs as the
reference: upsamplers 2×64×64×64, attentions 4×64×256×256 (NHWC here).

Run: python -m yolo_dbl_tpu.utils.benchmarks [--quick]
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


def avg_time(fn: Callable, *args, warmup: int = 1, repeat: int = 10) -> float:
    """Timed jitted calls with block_until_ready (tools.py:110 avg_time)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


def check_time(name: str, module, x, repeat: int = 10) -> Optional[Dict]:
    """Init + jit + time one module; prints name, output shape, s/iter
    (tools.py:120 check_time)."""
    try:
        variables = module.init(jax.random.PRNGKey(0), x)
        fn = jax.jit(lambda v, xx: module.apply(v, xx))
        dt = avg_time(fn, variables, x, repeat=repeat)
        out_shape = jax.eval_shape(fn, variables, x).shape
        print(f"{name:28s} {str(out_shape):24s} {dt:.6f} s/iter")
        return {"name": name, "shape": tuple(out_shape), "sec_per_iter": dt}
    except Exception as e:  # noqa: BLE001 — catalogue harness, mirror test.py's tolerance
        print(f"{name:28s} FAILED: {type(e).__name__}: {e}")
        return None


def upsample_catalogue(c: int = 64) -> List[Tuple[str, object]]:
    from ..nn import upsample as U
    from ..nn.blocks import DySample

    return [
        ("DySample", DySample(c)),
        ("CARAFE", U.CARAFE(c)),
        ("CARAFE_XiaLiPKU", U.CARAFE_XiaLiPKU(c)),
        ("CARAFE_simplified", U.CARAFE_simplified(c)),
        ("DLU", U.DLU(c)),
        ("EUCB", U.EUCB(c)),
        ("MEUM", U.MEUM(c)),
        ("CARAFEPack", U.CARAFEPack(c)),
        ("ResBlock_CBAM", U.ResBlock_CBAM(c, c)),
    ]


def attention_catalogue(c: int = 64) -> List[Tuple[str, object]]:
    from ..nn import attention as A
    from ..nn.blocks import LSKblock

    return [
        ("SELayer", A.SELayer(c)),
        ("ECALayer", A.ECALayer(c)),
        ("CBAM", A.CBAM(c)),
        ("SimAM", A.SimAM(c)),
        ("EMA", A.EMA(c, factor=8)),
        ("CoordAttention", A.CoordAttention(c, c)),
        ("GAM", A.GAM(c, c)),
        ("TripletAttention", A.TripletAttention(c)),
        ("MLCA", A.MLCA(c)),
        ("ELA", A.ELA(c)),
        ("BAM", A.BAM(c)),
        ("CoTNetLayer", A.CoTNetLayer(c)),
        ("LSKblock", LSKblock(c)),
        ("EfficientAttention", A.EfficientAttention(c, key_channels=64, head_count=8)),
        ("HiLo", A.HiLo(c, num_heads=8)),
        ("FullyAttentionalBlock", A.FullyAttentionalBlock(c)),
        ("NonLocalBlock2D", A.NonLocalBlock2D(c)),
        ("MHSA", A.MHSA(c, num_heads=4)),
        ("BoTAttention", A.BoTAttention(c, heads=4, dim_head=16)),
        ("EdgeAwareAttention", A.EdgeAwareAttention(c)),
        ("ECALayer_ns", A.ECALayer_ns(c)),
        ("AxialBlock_dynamic", A.AxialBlock_dynamic(c // 2, kernel_size=16)),
        ("AxialBlock_wopos", A.AxialBlock_wopos(c // 2, kernel_size=16)),
        ("ShiftWindowAttention", A.ShiftWindowAttention(c, heads=4, window_size=4, shift_size=2)),
        ("FusedKQnA", A.FusedKQnA(n_q=1, n_channels=c, n_heads=4)),
        ("DeBiAttention_YOLO", A.DeBiAttention_YOLO(c, c, num_heads=4)),
    ]


def upsample_test(quick: bool = False):
    """Reference test.py:9 — upsample pool on 2×64×64×64."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 64))
    results = []
    for name, module in upsample_catalogue():
        r = check_time(name, module, x, repeat=3 if quick else 10)
        if r:
            results.append(r)
    return results


def attention_test(quick: bool = False):
    """Reference test.py:42 — attention pool on 4×64×256×256 (NHWC: 4×256×256×64)."""
    shape = (1, 64, 64, 64) if quick else (4, 256, 256, 64)
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    results = []
    for name, module in attention_catalogue():
        r = check_time(name, module, x, repeat=3 if quick else 10)
        if r:
            results.append(r)
    return results


if __name__ == "__main__":
    import sys

    quick = "--quick" in sys.argv
    print("== upsample pool ==")
    upsample_test(quick)
    print("== attention pool ==")
    attention_test(quick)
