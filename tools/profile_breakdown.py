"""Component timing breakdown for yolov13s_DBL inference on the TPU chip."""
import sys, time, json
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp

from yolo_dbl_tpu.nn.tasks import DetectionModel
from yolo_dbl_tpu.ops.nms import non_max_suppression

batch, imgsz, dtype = 64, 640, jnp.bfloat16

def timeit(fn, args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    # distinct inputs to defeat dedupe: reuse same args but fetch outputs
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = leaf.reshape(-1)[0].item()
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1000:8.2f} ms/batch  {batch/dt:8.1f} img/s")
    return dt

key = jax.random.PRNGKey(0)
x = jax.block_until_ready(jax.random.uniform(key, (batch, imgsz, imgsz, 3), dtype=dtype))

for cfg in ["yolov13s.yaml", "yolov13s_DBL.yaml"]:
    model = DetectionModel(cfg, nc=3, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    fwd = jax.jit(lambda v, im: model.predict(v, im))
    pred = jax.block_until_ready(fwd(variables, x))
    timeit(fwd, (variables, x), name=f"{cfg} forward+decode")
    if "DBL" in cfg:
        nms = jax.jit(lambda p: non_max_suppression(p.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300))
        timeit(nms, (pred,), name="NMS alone")
        full = jax.jit(lambda v, im: non_max_suppression(model.predict(v, im).astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300))
        jax.block_until_ready(full(variables, x))
        timeit(full, (variables, x), name="forward+decode+NMS")
