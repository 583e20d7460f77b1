"""Throughput vs batch size for the full model+NMS (bench protocol)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from yolo_dbl_tpu.nn.tasks import DetectionModel
from yolo_dbl_tpu.ops.nms import non_max_suppression

imgsz, dtype = 640, jnp.bfloat16
model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=dtype)
variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)


def infer(v, img):
    pred = model.predict(v, img)
    return non_max_suppression(pred.astype(jnp.float32), conf_thres=0.25,
                               iou_thres=0.45, max_det=300)


fn = jax.jit(infer)

for batch, n_iters in [(32, 20), (64, 16), (128, 10), (192, 6)]:
    try:
        xs = [jax.block_until_ready(jax.random.uniform(
            jax.random.PRNGKey(i), (batch, imgsz, imgsz, 3), dtype)) for i in range(n_iters)]
        dets, counts = fn(variables, xs[0])
        jax.block_until_ready((dets, counts))
        t0 = time.perf_counter()
        outs = [fn(variables, x) for x in xs]
        for d, c in outs:
            _ = c.sum().item()
        dt = time.perf_counter() - t0
        print(f"batch {batch:4d}: {batch * n_iters / dt:8.1f} img/s ({dt / n_iters * 1000:.1f} ms/b)", flush=True)
        del xs, outs
    except Exception as e:
        print(f"batch {batch:4d}: {type(e).__name__}", flush=True)
