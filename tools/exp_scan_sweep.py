"""Sweep (batch, K) under the scan-dispatch inference protocol.

bench.py's round-3 protocol (lax.scan over K distinct batches, one dispatch)
measured 1037 img/s at b128/K8. The b128 operating point was chosen under
the per-dispatch protocol (tools/exp_batch.py: 890 at b128 vs 843 at b192);
with dispatch overhead amortized the optimum may move. HBM bound: inputs are
K*B*640*640*3*2 bytes (b128/K8 = 2.5 GB) + activations; keep K*B <= 1536.

Run on the real chip: python tools/exp_scan_sweep.py
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp

from yolo_dbl_tpu.nn.tasks import DetectionModel
from yolo_dbl_tpu.ops.nms import non_max_suppression


def time_point(model, variables, batch, k, imgsz=640, trials=3):
    def infer(v, img):
        pred = model.predict(v, img)
        return non_max_suppression(
            pred.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300
        )

    def infer_scan(v, stacked):
        def body(_, x):
            return None, infer(v, x)

        _, outs = jax.lax.scan(body, None, stacked)
        return outs

    fn_scan = jax.jit(infer_scan)
    stacked = jax.block_until_ready(
        jax.random.uniform(
            jax.random.PRNGKey(0), (k, batch, imgsz, imgsz, 3), dtype=jnp.bfloat16
        )
    )
    jax.block_until_ready(fn_scan(variables, stacked))  # compile

    def trial():
        t0 = time.perf_counter()
        dets, counts = fn_scan(variables, stacked)
        _ = counts.sum().item()
        jax.block_until_ready(dets)
        return batch * k / (time.perf_counter() - t0)

    _ = trial()  # discard cold fetch
    ts = [trial() for _ in range(trials)]
    del stacked
    return statistics.median(ts), ts


def main():
    import sys

    model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), imgsz=640)
    if len(sys.argv) > 1:  # single point: exp_scan_sweep.py BATCH K
        points = [(int(sys.argv[1]), int(sys.argv[2]))]
    else:
        points = [(128, 8), (128, 12), (96, 12), (160, 8), (192, 6), (64, 16)]
    for batch, k in points:
        try:
            med, ts = time_point(model, variables, batch, k)
            print(f"b{batch} K{k}: {med:8.1f} img/s  {['%.0f' % t for t in ts]}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping past OOM points
            print(f"b{batch} K{k}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
