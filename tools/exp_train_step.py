"""Training-step throughput for yolov13s_DBL on the real chip (bf16).

Same honesty rules as bench.py: distinct batches, host-fetched scalar per
step. Reports ms/step and img/s for the fused forward+backward+update.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dbl_tpu.engine.trainer import Trainer
from yolo_dbl_tpu.nn.tasks import DetectionModel

batch, imgsz = int(sys.argv[1]) if len(sys.argv) > 1 else 16, 640
model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=jnp.bfloat16)
trainer = Trainer(model, overrides={"batch": batch, "imgsz": imgsz, "epochs": 1})
t0 = time.time()
trainer.setup(steps_per_epoch=100, imgsz=imgsz)
print(f"setup {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
def mkbatch(i):
    return {
        "img": rng.random((batch, imgsz, imgsz, 3), np.float32).astype(np.float32),
        "gt_boxes": np.tile(np.array([[[0.5, 0.5, 0.4, 0.4]]], np.float32), (batch, 16, 1)),
        "gt_cls": np.zeros((batch, 16), np.int32),
        "gt_mask": np.pad(np.ones((batch, 2), np.float32), ((0, 0), (0, 14))),
    }

key = jax.random.PRNGKey(0)
t0 = time.time()
m = trainer.step(mkbatch(0), key)
print(f"first step (compile) {time.time()-t0:.1f}s loss={float(m['loss']):.3f}", flush=True)

batches = [mkbatch(i) for i in range(8)]
t0 = time.perf_counter()
for i, b in enumerate(batches):
    m = trainer.step(b, jax.random.fold_in(key, i))
    _ = float(m["loss"])  # host fetch forces completion
dt = (time.perf_counter() - t0) / len(batches)
print(f"train step b{batch}@{imgsz}: {dt*1000:.1f} ms/step  {batch/dt:.1f} img/s", flush=True)
