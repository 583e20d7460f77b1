"""Scoped int8 serving A/B (round 4 follow-up): does a SURGICAL int8 window
survive composition where whole-trunk int8 lost?

tools/exp_int8_e2e.py measured whole-trunk static int8 at 0.95x bf16: in a
bandwidth-bound step, quantize passes are added traffic wherever the bf16
activation must materialize anyway (shortcut/concat side-consumers). But
the flagship's EARLY high-resolution chain (H >= 320) is plain
conv->BN->SiLU->conv structure with the LARGEST activation streams
(640^2x16/32 bf16 = 1.6-3.3 GB per b128 step): there the quantize is a
fusable epilogue on the producing conv — the int8 stream replaces the bf16
one — and the probe measured 1.53x on exactly the 16->32 s2 @640 shape.
The deep window (H <= 80, C >= 256) is the opposite regime: compute-heavy
1x1/3x3 convs that won 1.6-2.5x op-level but whose inputs feed concats.

Modes (all static calibrated scales, same protocol as exp_int8_e2e.py:
scan K=12 over distinct b128 blocks, outputs host-fetched, median of 5):
    bf16            baseline
    int8-early      predicate H >= 320
    int8-stem       predicate H >= 640 (minimal: just the widest conv(s))
    int8-deep       predicate H <= 80 and C_in >= 256
    int8-earlydeep  early | deep

Run on the real chip:  python tools/exp_int8_scope.py
"""

from __future__ import annotations

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


SCOPES = {
    "int8-early": lambda mod, x: x.shape[1] >= 320,
    "int8-stem": lambda mod, x: x.shape[1] >= 640,
    "int8-deep": lambda mod, x: x.shape[1] <= 80 and x.shape[-1] >= 256,
    "int8-earlydeep": lambda mod, x: x.shape[1] >= 320 or (x.shape[1] <= 80 and x.shape[-1] >= 256),
}


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

    results = {}
    for name in ["bf16"] + list(SCOPES):
        pred = SCOPES.get(name)
        fn = make_scan()
        t0 = time.perf_counter()
        if pred is None:
            jax.block_until_ready(fn(variables, stacked))
        else:
            scales = calibrate(lambda v, x: model.predict(v, x), variables,
                               stacked[0], predicate=pred)
            print(f"# {name}: {len(scales)} convs in scope", file=sys.stderr)
            with int8_serving(scales=scales, predicate=pred):
                jax.block_until_ready(fn(variables, stacked))
        print(f"# {name} compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        _ = trial(fn, variables, stacked, batch, n_iters)  # cold-fetch discard
        ts = [trial(fn, variables, stacked, batch, n_iters) for _ in range(5)]
        results[name] = statistics.median(ts)
        print(f"{name:15s} {results[name]:8.1f} img/s/chip  "
              f"(trials {['%.0f' % t for t in ts]})", file=sys.stderr)
        del fn

    base = results["bf16"]
    for name in SCOPES:
        print(f"# {name}: {results[name]/base:.3f}x vs bf16", file=sys.stderr)


if __name__ == "__main__":
    main()
