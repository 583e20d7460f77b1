"""Can the honest u8 e2e path ride the scan-dispatch protocol?

Findings 4/6 (PROFILE.md): u8 blocks must be neither CARRIED through nor
SLICED inside lax.scan on this runtime. But the training fix generalizes:
letterbox+normalize the WHOLE (K*B, H, W, 3) u8 block in ONE Pallas op
(emitting bf16 directly, out_dtype arg) and scan over the resulting float
block — the u8 array is consumed exactly once, outside the scan.

Usage: python tools/exp_u8_scan.py [K] [B]
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from yolo_dbl_tpu.kernels.preprocess import letterbox_normalize
from yolo_dbl_tpu.nn.tasks import DetectionModel
from yolo_dbl_tpu.ops.nms import non_max_suppression

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
imgsz, src_hw, dtype = 640, (512, 768), jnp.bfloat16

model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=dtype)
variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)


def infer(v, img):
    pred = model.predict(v, img)
    return non_max_suppression(pred.astype(jnp.float32), conf_thres=0.25,
                               iou_thres=0.45, max_det=300)


def infer_u8_scan(v, u8block):
    k, b = u8block.shape[:2]
    flat = u8block.reshape(k * b, *u8block.shape[2:])
    img = letterbox_normalize(flat, (imgsz, imgsz), scaleup=False,
                              out_dtype=dtype)
    img = img.reshape(k, b, imgsz, imgsz, 3)

    def body(_, x):
        return None, infer(v, x)

    return jax.lax.scan(body, None, img)[1]


fn = jax.jit(infer_u8_scan)
rng = np.random.default_rng(0)
block = jax.block_until_ready(jnp.asarray(
    rng.integers(0, 255, (K, B, *src_hw, 3), dtype=np.uint8)))
print(f"staged u8 block {block.nbytes/2**20:.0f} MiB", flush=True)

jax.block_until_ready(fn(variables, block))  # compile


def trial():
    t0 = time.perf_counter()
    dets, counts = fn(variables, block)
    _ = counts.sum().item()
    jax.block_until_ready(dets)
    return K * B / (time.perf_counter() - t0)


_ = trial()  # discard cold fetch
trials = [trial() for _ in range(5)]
print(f"u8-scan K={K} B={B}: {statistics.median(trials):.1f} img/s/chip "
      f"(trials {['%.0f' % t for t in trials]})")
