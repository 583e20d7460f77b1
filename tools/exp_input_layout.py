"""Input-layout A/B: stage the scan block in the executable's preferred
layout (round 5).

The post-DySample traffic map shows a 629 MB in-program copy of the img
batch per scan step (`%copy.874 bf16[128,640,640,3]{0,3,2,1:T(4,128)}
copy(%img)`): the jit argument arrives in the default row-major layout and
the stem conv wants the tiled batch-minor one, so every scan iteration
pays a full read+write of the batch (~0.9% of the step). A production
server controls its input buffers, so let it stage them in the layout the
program wants: compile with `Format(Layout.AUTO)` on the image argument
and device_put the block into `compiled.input_formats` before the timed
region — the copy should vanish from the program.

Protocol: bench.py scan protocol (K=12 distinct b128 blocks, host-fetched,
median of 5), default-layout arm vs AUTO-layout arm in one session.

Run on the real chip: python tools/exp_input_layout.py
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout


def trial(fn, variables, stacked, batch, n):
    t0 = time.perf_counter()
    dets, counts = fn(variables, stacked)
    _ = counts.sum().item()
    jax.block_until_ready(dets)
    return batch * n / (time.perf_counter() - t0)


def main():
    from yolo_dbl_tpu.nn.tasks import DetectionModel
    from yolo_dbl_tpu.ops.nms import non_max_suppression

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    batch, imgsz, n_iters = 128, 640, 12
    dtype = jnp.bfloat16

    model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)

    def infer(v, img):
        pred = model.predict(v, img)
        return non_max_suppression(
            pred.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300)

    def infer_scan(v, st):
        def body(_, x):
            return None, infer(v, x)
        return jax.lax.scan(body, None, st)[1]

    stacked = jax.block_until_ready(jax.random.uniform(
        jax.random.PRNGKey(0), (n_iters, batch, imgsz, imgsz, 3), dtype=dtype))

    results = {}

    # arm 1: default layouts (bench.py of record)
    fn = jax.jit(infer_scan)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(variables, stacked))
    print(f"# default compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    _ = trial(fn, variables, stacked, batch, n_iters)
    ts = [trial(fn, variables, stacked, batch, n_iters) for _ in range(5)]
    results["default"] = statistics.median(ts)
    print(f"default      {results['default']:8.1f} img/s/chip  "
          f"(trials {['%.0f' % t for t in ts]})", file=sys.stderr)
    del fn

    # arm 2: AUTO input layouts — compile with the image block free to take
    # the program's preferred layout, then stage the block in that layout
    auto = Format(Layout.AUTO)
    fmt_tree = (jax.tree.map(lambda _: auto, variables), auto)
    fn2 = jax.jit(infer_scan, in_shardings=fmt_tree)
    t0 = time.perf_counter()
    lowered = fn2.lower(variables, stacked)
    compiled = lowered.compile()
    in_fmts = compiled.input_formats[0]
    print(f"# AUTO compiled in {time.perf_counter()-t0:.0f}s; "
          f"img layout: {in_fmts[1]}", file=sys.stderr)
    v_opt = jax.device_put(variables, in_fmts[0])
    stacked_opt = jax.block_until_ready(jax.device_put(stacked, in_fmts[1]))
    jax.block_until_ready(compiled(v_opt, stacked_opt))
    _ = trial(compiled, v_opt, stacked_opt, batch, n_iters)
    ts = [trial(compiled, v_opt, stacked_opt, batch, n_iters) for _ in range(5)]
    results["auto"] = statistics.median(ts)
    print(f"auto-layout  {results['auto']:8.1f} img/s/chip  "
          f"(trials {['%.0f' % t for t in ts]})", file=sys.stderr)

    print(f"# auto-layout: {results['auto']/results['default']:.3f}x vs default",
          file=sys.stderr)


if __name__ == "__main__":
    main()
