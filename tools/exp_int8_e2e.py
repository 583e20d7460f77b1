"""int8 serving e2e A/B (round 4): flagship b128@640 predict+NMS throughput
in three modes — bf16 baseline, dynamic int8 (runtime per-tensor act
scales), static int8 (calibrated scales from ops/quantize.calibrate).

The shape-level probe (tools/exp_int8.py) measured 1.5-2.5x conv wins; the
dynamic e2e was a WASH (1080.8 vs 1080.1 img/s — the per-conv global max
reduction + quantize/rescale passes eat the conv win). This A/B answers
whether STATIC scales (max-reduce gone, quantize fusable into the producer
epilogue) recover the win. Protocol identical to bench.py: lax.scan over
K=12 distinct b128 blocks, one dispatch per trial, outputs host-fetched,
median of 5.

Run on the real chip:  python tools/exp_int8_e2e.py

RESULT (real v5e, 2026-08-19): NO — bf16 1107.3, int8-static 1055.0
(0.953x), int8-dynamic 871.6 (0.787x) img/s/chip. See PROFILE.md
"int8 serving e2e: NO-GO" for the traffic analysis (shortcut/concat
structure forces the bf16 activations to materialize regardless, so
quantize passes are added HBM traffic in a bandwidth-bound step).
"""

from __future__ import annotations

import statistics
import sys
import time

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
    from yolo_dbl_tpu.ops.quantize import calibrate, int8_serving

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    batch, imgsz, n_iters = 128, 640, 12
    dtype = jnp.bfloat16

    model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)

    def infer(v, img):
        pred = model.predict(v, img)
        return non_max_suppression(
            pred.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300)

    def make_scan():
        def infer_scan(v, stacked):
            def body(_, x):
                return None, infer(v, x)
            return jax.lax.scan(body, None, stacked)[1]
        return jax.jit(infer_scan)

    stacked = jax.block_until_ready(jax.random.uniform(
        jax.random.PRNGKey(0), (n_iters, batch, imgsz, imgsz, 3), dtype=dtype))

    # calibration: one representative batch (the first scan slice), jitted
    t0 = time.perf_counter()
    scales = calibrate(lambda v, x: model.predict(v, x), variables, stacked[0])
    print(f"# calibrated {len(scales)} conv scales in {time.perf_counter()-t0:.1f}s "
          f"(min {min(scales):.3g} max {max(scales):.3g})", file=sys.stderr)

    results = {}
    modes = [
        ("bf16", None),
        ("int8-dynamic", int8_serving()),
        ("int8-static", int8_serving(scales=scales)),
    ]
    for name, ctx in modes:
        fn = make_scan()
        if ctx is None:
            jax.block_until_ready(fn(variables, stacked))  # trace+compile bf16
        else:
            with ctx:  # interception happens at TRACE time
                jax.block_until_ready(fn(variables, stacked))
        _ = trial(fn, variables, stacked, batch, n_iters)  # cold-fetch discard
        ts = [trial(fn, variables, stacked, batch, n_iters) for _ in range(5)]
        results[name] = statistics.median(ts)
        print(f"{name:14s} {results[name]:8.1f} img/s/chip  "
              f"(trials {['%.0f' % t for t in ts]})", file=sys.stderr)
        del fn

    base = results["bf16"]
    for name in ("int8-dynamic", "int8-static"):
        print(f"# {name}: {results[name]/base:.3f}x vs bf16", file=sys.stderr)


if __name__ == "__main__":
    main()
