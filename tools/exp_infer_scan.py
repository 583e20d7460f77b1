"""A/B: per-dispatch inference vs scan-dispatch (K batches in one dispatch).

Round-3 b128 breakdown (tools/profile_breakdown.py): forward+decode ~111 ms,
NMS ~17 ms, yet bench.py measures ~147 ms/batch — the gap is per-dispatch
tunnel overhead the trainer already amortizes with make_train_scan. This
experiment applies the same trick to inference: lax.scan over a stacked
(K, B, H, W, 3) block of DISTINCT inputs, all outputs fetched.

Run on the real chip: python tools/exp_infer_scan.py
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp

from yolo_dbl_tpu.nn.tasks import DetectionModel
from yolo_dbl_tpu.ops.nms import non_max_suppression


def fetch(outs):
    for o in jax.tree_util.tree_leaves(outs):
        jax.block_until_ready(o)


def main():
    batch, imgsz, K = 128, 640, 8
    dtype = jnp.bfloat16
    model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)

    def infer(v, img):
        pred = model.predict(v, img)
        return non_max_suppression(
            pred.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300
        )

    fn = jax.jit(infer)

    def infer_scan(v, stacked):
        def body(_, x):
            return None, infer(v, x)

        _, outs = jax.lax.scan(body, None, stacked)
        return outs

    fn_scan = jax.jit(infer_scan)

    xs = [
        jax.block_until_ready(
            jax.random.uniform(jax.random.PRNGKey(i), (batch, imgsz, imgsz, 3), dtype=dtype)
        )
        for i in range(K)
    ]
    stacked = jax.block_until_ready(jnp.stack(xs))

    # warm both
    fetch(fn(variables, xs[0]))
    fetch(fn_scan(variables, stacked))

    def trial_per_dispatch():
        t0 = time.perf_counter()
        outs = [fn(variables, x) for x in xs]
        for _, c in outs:
            _ = c.sum().item()
        return batch * K / (time.perf_counter() - t0)

    def trial_scan():
        t0 = time.perf_counter()
        dets, counts = fn_scan(variables, stacked)
        _ = counts.sum().item()
        jax.block_until_ready(dets)
        return batch * K / (time.perf_counter() - t0)

    per = [trial_per_dispatch() for _ in range(3)]
    sc = [trial_scan() for _ in range(3)]
    print(f"per-dispatch (bench.py protocol): {statistics.median(per):.1f} img/s  {['%.0f' % t for t in per]}")
    print(f"scan-dispatch K={K}:              {statistics.median(sc):.1f} img/s  {['%.0f' % t for t in sc]}")

    # sanity: identical outputs batch 0
    d0, c0 = fn(variables, xs[0])
    ds, cs = fn_scan(variables, stacked)
    import numpy as np

    assert np.array_equal(np.asarray(c0), np.asarray(cs[0])), "counts mismatch"
    assert np.allclose(np.asarray(d0), np.asarray(ds[0]), atol=1e-5), "dets mismatch"
    print("outputs identical: OK")


if __name__ == "__main__":
    main()
