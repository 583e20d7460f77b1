"""Honest end-to-end training throughput: host uint8 batches -> Trainer.fit.

This is the number a user gets from the production path (engine/trainer.py):
distinct pre-built HOST uint8 batches are fed through fit(), which stacks
K=8 of them per device dispatch (make_train_scan), ships the block as uint8
(4x less H2D than f32), normalizes once on device, and keeps one dispatch in
flight so staging overlaps compute. Compare with the compute-only number
from tools/exp_train_scan.py (102.9 ms/step fused-stem / 122.1 standard at
b16@640 bf16).

Usage: python tools/exp_train_e2e.py [batch] [steps]
Prints steady-state ms/step and img/s over the last (steps - K) steps.
Reference hot loop being matched: reference engine/trainer.py:363-386.
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
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
imgsz = 640
K = 8

model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=jnp.bfloat16)
trainer = Trainer(model, overrides={"batch": batch, "imgsz": imgsz, "epochs": 1},
                  scan_steps=K)
t0 = time.time()
trainer.setup(steps_per_epoch=steps, imgsz=imgsz)
print(f"setup {time.time() - t0:.1f}s", flush=True)

rng = np.random.default_rng(0)


def mkbatch(i):
    # distinct uint8 images per batch (the runtime dedupes identical inputs)
    img = rng.integers(0, 256, (batch, imgsz, imgsz, 3), np.uint8)
    return {
        "img": img,
        "gt_boxes": np.tile(np.array([[[0.5, 0.5, 0.4, 0.4]]], np.float32), (batch, 16, 1)),
        "gt_cls": np.zeros((batch, 16), np.int32),
        "gt_mask": np.pad(np.ones((batch, 2), np.float32), ((0, 0), (0, 14))),
    }


host_batches = [mkbatch(i) for i in range(steps)]

# warmup epoch: compile both the scan and (tail) per-step programs
t0 = time.time()
trainer.fit(iter(host_batches[:K]), epochs=1, steps_per_epoch=K)
print(f"compile+warmup {time.time() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
hist = trainer.fit(iter(host_batches), epochs=1, steps_per_epoch=steps)
dt = time.perf_counter() - t0
per = dt / steps
print(f"e2e fit: {per * 1000:.1f} ms/step  {batch / per:.1f} img/s "
      f"({steps} steps incl. uint8 H2D staging, loss={hist[-1]['loss']:.3f})",
      flush=True)
print("DONE", flush=True)
