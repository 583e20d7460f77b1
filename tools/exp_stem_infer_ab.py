"""Fused-stem INFERENCE A/B at the b128 scan operating point (round 5).

The space-to-depth stem rewrite (ops/fused_stem.py) is default-ON for
training (where it bought 131 -> 155 img/s) but opt-in for inference: the
round-2 e2e A/B at b64 per-dispatch measured it ~6% SLOWER (625 vs 663).
That verdict predates the scan protocol, b128, and the round 3-5
bandwidth work; today the step is ~84% of the MEASURED HBM ceiling and the
stem pair's 640-res intermediate (~2.5 GB read+write per b128 batch,
traffic map `runs/perf_r5/traffic_map_b128_post_dysample.txt` rows 1-2) is
~3.4% of the step. Re-measure before letting an old negative stand.

Protocol: identical to bench.py (scan K=12 over distinct b128 blocks,
host-fetched outputs, median of 5), both arms in one session.

Run on the real chip: python tools/exp_stem_infer_ab.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def trial(fn_scan, variables, stacked, batch, n):
    t0 = time.perf_counter()
    dets, counts = fn_scan(variables, stacked)
    _ = counts.sum().item()
    jax.block_until_ready(dets)
    return batch * n / (time.perf_counter() - t0)


def main():
    from yolo_dbl_tpu.nn.tasks import DetectionModel
    from yolo_dbl_tpu.ops.nms import non_max_suppression

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    batch, imgsz, n_iters = 128, 640, 12
    dtype = jnp.bfloat16

    model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)

    def infer(v, img):
        pred = model.predict(v, img)
        return non_max_suppression(
            pred.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300)

    stacked = jax.block_until_ready(jax.random.uniform(
        jax.random.PRNGKey(0), (n_iters, batch, imgsz, imgsz, 3), dtype=dtype))

    results = {}
    for name, flag in [("plain", None), ("fused-stem", "1")]:
        if flag is None:
            os.environ.pop("YOLO_DBL_FUSED_STEM", None)
        else:
            os.environ["YOLO_DBL_FUSED_STEM"] = flag

        def infer_scan(v, st):
            def body(_, x):
                return None, infer(v, x)
            return jax.lax.scan(body, None, st)[1]

        fn = jax.jit(infer_scan)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(variables, stacked))
        print(f"# {name} compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        _ = trial(fn, variables, stacked, batch, n_iters)  # cold-fetch discard
        ts = [trial(fn, variables, stacked, batch, n_iters) for _ in range(5)]
        results[name] = statistics.median(ts)
        print(f"{name:12s} {results[name]:8.1f} img/s/chip  "
              f"(trials {['%.0f' % t for t in ts]})", file=sys.stderr)
        del fn

    print(f"# fused-stem: {results['fused-stem']/results['plain']:.3f}x vs plain",
          file=sys.stderr)


if __name__ == "__main__":
    main()
