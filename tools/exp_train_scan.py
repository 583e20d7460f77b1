"""Hypothesis test (round 3): the 2.1 s/step train step is per-DISPATCH
overhead (TrainState pytree = ~1k buffer handles marshalled over the axon
tunnel per call), not compute — grad_model+loss+H2D only sum to ~400 ms
(tools/exp_train_breakdown.py).

Measures the SAME fused train step three ways at b16@640 bf16:
  per-call      trainer.step per batch (status quo: 2.1 s/step)
  scan-K        K steps in ONE dispatch over pre-staged device batches
  scan-K+u8     same with uint8 batches (/255 on device), 4x less H2D

If scan-K ≈ 400 ms/step the dispatch-overhead hypothesis is confirmed and
the fix is a multi-step scan trainer.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dbl_tpu.engine.trainer import Trainer, make_train_step
from yolo_dbl_tpu.nn.tasks import DetectionModel

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
imgsz = 640

model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=jnp.bfloat16)
trainer = Trainer(model, overrides={"batch": batch, "imgsz": imgsz, "epochs": 1})
t0 = time.time()
trainer.setup(steps_per_epoch=100, imgsz=imgsz)
print(f"setup {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)


def mkbatch(u8: bool):
    img = rng.random((batch, imgsz, imgsz, 3), np.float32)
    return {
        "img": (img * 255).astype(np.uint8) if u8 else img,
        "gt_boxes": np.tile(np.array([[[0.5, 0.5, 0.4, 0.4]]], np.float32), (batch, 16, 1)),
        "gt_cls": np.zeros((batch, 16), np.int32),
        "gt_mask": np.pad(np.ones((batch, 2), np.float32), ((0, 0), (0, 14))),
    }


key = jax.random.PRNGKey(0)
step = make_train_step(model, trainer.cfg, trainer.tx)

# ---- scan-K: one dispatch running K sequential steps ----
def many(state, stacked, rng):
    def body(st, b):
        st, m = step(st, b, rng)
        return st, m["loss"]

    return jax.lax.scan(body, state, stacked)


jmany = jax.jit(many)

for label, u8 in (("scan-%d+u8" % K, True), ("scan-%d f32" % K, False)):
    stacked_host = [mkbatch(u8) for _ in range(K)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stacked_host)
    stacked = jax.block_until_ready(jax.device_put(stacked))
    st, losses = jmany(trainer.state, stacked, key)
    jax.block_until_ready(losses)  # compile
    t0 = time.perf_counter()
    n_rep = 2
    cur = trainer.state
    for _ in range(n_rep):
        cur, losses = jmany(cur, stacked, key)
        _ = float(losses[-1])
    dt = (time.perf_counter() - t0) / (n_rep * K)
    print(f"{label}: {dt*1000:.1f} ms/step  {batch/dt:.1f} img/s (compute only, pre-staged)", flush=True)

    # include H2D: re-stage the stacked batches inside the timed region
    t0 = time.perf_counter()
    for _ in range(n_rep):
        stacked_d = jax.device_put(jax.tree_util.tree_map(lambda *xs: np.stack(xs), *stacked_host))
        cur, losses = jmany(cur, stacked_d, key)
        _ = float(losses[-1])
    dt = (time.perf_counter() - t0) / (n_rep * K)
    print(f"{label}: {dt*1000:.1f} ms/step  {batch/dt:.1f} img/s (incl. H2D restage)", flush=True)
