"""Training-step throughput for yolov13s_DBL on the real chip (bf16).

Same honesty rules as bench.py: distinct batches, host-fetched scalar per
dispatch. Reports ms/step and img/s for the fused forward+backward+update,
both per-step dispatch and the production scan path (Trainer.step_many —
round-3 fix for the ~1.9 s/step dispatch overhead, tools/exp_train_scan.py).

Usage: python tools/exp_train_step.py [batch] [scan_steps]
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

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
imgsz = 640
model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=jnp.bfloat16)
trainer = Trainer(model, overrides={"batch": batch, "imgsz": imgsz, "epochs": 1},
                  scan_steps=K)
t0 = time.time()
trainer.setup(steps_per_epoch=100, imgsz=imgsz)
print(f"setup {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
def mkbatch(i):
    return {
        # uint8 like the production DataLoader (data/build.py format_batch):
        # 4x less H2D, /255 on device
        "img": (rng.random((batch, imgsz, imgsz, 3), np.float32) * 255).astype(np.uint8),
        "gt_boxes": np.tile(np.array([[[0.5, 0.5, 0.4, 0.4]]], np.float32), (batch, 16, 1)),
        "gt_cls": np.zeros((batch, 16), np.int32),
        "gt_mask": np.pad(np.ones((batch, 2), np.float32), ((0, 0), (0, 14))),
    }

key = jax.random.PRNGKey(0)

# ---- production path: scan_steps batches per dispatch ----
chunk = [mkbatch(i) for i in range(K)]
t0 = time.time()
m = trainer.step_many(chunk, key)
jax.block_until_ready(m["loss"])
print(f"scan compile {time.time()-t0:.1f}s loss={float(np.asarray(m['loss'])[-1]):.3f}", flush=True)

# warm until two windows agree (process warm-up reads 5-100x high at first)
def window(reps=2):
    t0 = time.perf_counter()
    for r in range(reps):
        m = trainer.step_many([mkbatch(r * K + i) for i in range(K)], key)
        _ = float(np.asarray(m["loss"])[-1])
    return (time.perf_counter() - t0) / (reps * K)

prev = window()
for _ in range(6):
    cur = window()
    if abs(cur - prev) / min(cur, prev) < 0.15:
        prev = min(prev, cur)
        break
    prev = cur
print(f"train scan-{K} b{batch}@{imgsz}: {prev*1000:.1f} ms/step  {batch/prev:.1f} img/s "
      f"(incl. uint8 H2D)", flush=True)

# ---- per-step dispatch for comparison ----
t0 = time.time()
m = trainer.step(mkbatch(0), key)
_ = float(m["loss"])
print(f"per-step compile {time.time()-t0:.1f}s", flush=True)
batches = [mkbatch(i) for i in range(4)]
t0 = time.perf_counter()
for i, b in enumerate(batches):
    m = trainer.step(b, jax.random.fold_in(key, i))
    _ = float(m["loss"])
dt = (time.perf_counter() - t0) / len(batches)
print(f"train per-step b{batch}@{imgsz}: {dt*1000:.1f} ms/step  {batch/dt:.1f} img/s", flush=True)
