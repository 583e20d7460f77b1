"""Training roofline (round 4): is the b48@640 train step, like inference,
HBM-bandwidth-bound?

The inference roofline (PROFILE.md) showed the b128 predict step at 21% MFU
and ~67% of peak HBM bandwidth — schedule tuning exhausted. This runs the
same XLA cost analysis on the COMPILED scan-K train step (the exact
program tools/exp_train_scan.py times) and compares the compute and
bandwidth floors against the measured 204.9 ms/step (234.3 img/s/chip,
2026-08-19).

Run on the real chip:  python tools/exp_train_roofline.py [batch] [K]

Counting caveat (verified on-chip 2026-08-19): XLA's cost_analysis counts a
while-loop body ONCE, not x trip count — the scan-K executable reports the
same flops as a single step (5.89 TFLOP at b48 for K=8 and K=1 alike). So
the per-step numbers below are the analysis values UNDIVIDED; do not divide
by K.
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

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
imgsz = 640

PEAK_TFLOPS_BF16 = 197.0  # v5e
PEAK_GBPS = 819.0

model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=jnp.bfloat16)
trainer = Trainer(model, overrides={"batch": batch, "imgsz": imgsz, "epochs": 1})
t0 = time.time()
trainer.setup(steps_per_epoch=100, imgsz=imgsz)
print(f"# setup {time.time()-t0:.1f}s  devices={jax.devices()}", flush=True)

step = make_train_step(model, trainer.cfg, trainer.tx)


def many(state, stacked, rng):
    def body(st, b):
        st, m = step(st, b, rng)
        return st, m["loss"]

    return jax.lax.scan(body, state, stacked)


# lower against abstract inputs — no 4.7 GB batch block staged just to count
sds = lambda sh, dt: jax.ShapeDtypeStruct(sh, dt)
stacked_abs = {
    "img": sds((K, batch, imgsz, imgsz, 3), jnp.float32),
    "gt_boxes": sds((K, batch, 16, 4), jnp.float32),
    "gt_cls": sds((K, batch, 16), jnp.int32),
    "gt_mask": sds((K, batch, 16), jnp.float32),
}
state_abs = jax.tree_util.tree_map(lambda x: sds(jnp.shape(x), x.dtype), trainer.state)
key_abs = sds((2,), jnp.uint32)

t0 = time.time()
compiled = jax.jit(many).lower(state_abs, stacked_abs, key_abs).compile()
print(f"# compiled in {time.time()-t0:.1f}s", flush=True)

an = compiled.cost_analysis()
if isinstance(an, list):
    an = an[0]
# NOT divided by K: cost_analysis counts the scan body once (see docstring)
flops = float(an.get("flops", 0.0))
byts = float(an.get("bytes accessed", 0.0))
mem = compiled.memory_analysis()

measured_ms = 204.9  # tools/exp_train_scan.py b48 scan-8 f32, 2026-08-19
t_compute = flops / (PEAK_TFLOPS_BF16 * 1e12) * 1e3
t_bw = byts / (PEAK_GBPS * 1e9) * 1e3
print(f"flops/step            {flops/1e12:.2f} TFLOP")
print(f"bytes accessed/step   {byts/1e9:.1f} GB (XLA estimate)")
print(f"temp HBM              {mem.temp_size_in_bytes/1e9:.2f} GB")
print(f"compute floor @{PEAK_TFLOPS_BF16:.0f} TFLOP/s   {t_compute:.1f} ms")
print(f"bandwidth floor @{PEAK_GBPS:.0f} GB/s  {t_bw:.1f} ms")
print(f"measured              {measured_ms:.1f} ms/step ({batch/measured_ms*1e3:.1f} img/s)")
print(f"MFU                   {t_compute/measured_ms*100:.1f}%")
print(f"sustained bandwidth   {byts/ (measured_ms/1e3) / 1e9:.0f} GB/s "
      f"= {byts/(measured_ms/1e3)/1e9/PEAK_GBPS*100:.0f}% of peak")
