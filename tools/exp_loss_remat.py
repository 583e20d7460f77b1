"""Loss remat A/B (round 4): does jax.checkpoint around the detection loss
cut the train step's HBM traffic?

The training roofline (PROFILE.md) shows the b48@640 step bandwidth-bound:
14.6% MFU at 78% of peak HBM bandwidth, 131.7 GB accessed per step. The
loss's saved residuals are (B, A=8400, 64) f32 tensors (~100 MB each,
several of them) written forward and read back in grad_loss (15.4 ms);
rematerializing the ~12 ms loss forward in the backward trades those
round-trips for flops the idle MXU has to spare.

Also re-checks the b64 operating point: the b48-beats-b64 sweep predates
the gather-free DFL + sort-free TAL fix that removed ~58 ms of loss from
every step, which shifts the batch-scaling balance.

Run on the real chip:  python tools/exp_loss_remat.py [K] [batches...]
(defaults: K=8, batches 48 64)
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

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
batches = [int(b) for b in sys.argv[2:]] or [48, 64]
imgsz = 640

model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=jnp.bfloat16)
trainer = Trainer(model, overrides={"batch": batches[0], "imgsz": imgsz, "epochs": 1})
t0 = time.time()
trainer.setup(steps_per_epoch=100, imgsz=imgsz)
print(f"# setup {time.time()-t0:.1f}s  devices={jax.devices()}", flush=True)

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)


def mkstacked(b):
    host = [
        {
            "img": rng.random((b, imgsz, imgsz, 3), np.float32),
            "gt_boxes": np.tile(np.array([[[0.5, 0.5, 0.4, 0.4]]], np.float32), (b, 16, 1)),
            "gt_cls": np.zeros((b, 16), np.int32),
            "gt_mask": np.pad(np.ones((b, 2), np.float32), ((0, 0), (0, 14))),
        }
        for _ in range(K)
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *host)
    return jax.block_until_ready(jax.device_put(stacked))


for remat in (False, True):
    step = make_train_step(model, trainer.cfg, trainer.tx, remat_loss=remat)

    def many(state, stacked, rng):
        def body(st, bb):
            st, m = step(st, bb, rng)
            return st, m["loss"]

        return jax.lax.scan(body, state, stacked)

    jmany = jax.jit(many)
    for b in batches:
        stacked = mkstacked(b)
        t0 = time.time()
        st, losses = jmany(trainer.state, stacked, key)
        jax.block_until_ready(losses)
        print(f"# compile remat={remat} b={b}: {time.time()-t0:.0f}s", flush=True)
        best = float("inf")
        cur = trainer.state
        for _ in range(3):
            t0 = time.perf_counter()
            cur, losses = jmany(cur, stacked, key)
            _ = float(losses[-1])
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"remat={int(remat)} b={b}: {best*1e3:.1f} ms/step  "
              f"{b/best:.1f} img/s (compute only, best of 3)", flush=True)
        del stacked, cur, losses
