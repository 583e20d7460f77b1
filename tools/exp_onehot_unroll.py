"""Unrolled one-hot chunking A/B (round 5).

The post-layout traffic map still shows ~840 MB of while-loop boundary
relayout copies per b128 step at the m13/m22 DySample sites: lax.map's
carried chunk buffers enter/exit the loop in a loop-fixed layout
({2,3,1,0} <-> {3,1,0,2}), ~1.25 ms at the measured 670 GB/s. Unrolling
the chunk loop into static slices + concat lets layout assignment
propagate through each chunk's fusion with no loop boundary.

Protocol: bench.py scan protocol (K=12 distinct b128 blocks, host-fetched,
median of 5), BOTH arms staged in the executable's preferred input layout
(Format(Layout.AUTO) + device_put, the round-5 config of record); arm 1 =
lax.map (default), arm 2 = YOLO_DBL_ONEHOT_UNROLL=1.

Run on the real chip: python tools/exp_onehot_unroll.py
"""
from __future__ import annotations

import os
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

    auto = Format(Layout.AUTO)
    fmt_tree = (jax.tree.map(lambda _: auto, variables), auto)
    results = {}
    outs = {}

    # env "0"/"1" force the path either way (the shipped default is
    # unrolled-at-inference, lax.map under train — nn/blocks.py DySample)
    for name, flag in (("lax.map", "0"), ("unrolled", "1")):
        os.environ["YOLO_DBL_ONEHOT_UNROLL"] = flag
        # the env flag is read at TRACE time: drop the trace cache or the
        # second arm silently reuses the first arm's lowering (observed:
        # "compiled in 0s", bitwise-identical program)
        jax.clear_caches()
        fn = jax.jit(infer_scan, in_shardings=fmt_tree)
        t0 = time.perf_counter()
        compiled = fn.lower(variables, stacked).compile()
        in_fmts = compiled.input_formats[0]
        print(f"# {name} compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
        v_opt = jax.device_put(variables, in_fmts[0])
        st_opt = jax.block_until_ready(jax.device_put(stacked, in_fmts[1]))
        dets, counts = compiled(v_opt, st_opt)
        outs[name] = (jax.device_get(dets), jax.device_get(counts))
        _ = trial(compiled, v_opt, st_opt, batch, n_iters)
        ts = [trial(compiled, v_opt, st_opt, batch, n_iters) for _ in range(5)]
        results[name] = statistics.median(ts)
        print(f"{name:9s} {results[name]:8.1f} img/s/chip  "
              f"(trials {['%.0f' % t for t in ts]})", file=sys.stderr)
        del fn, compiled, v_opt, st_opt

    import numpy as np
    same = (np.array_equal(outs["lax.map"][0], outs["unrolled"][0])
            and np.array_equal(outs["lax.map"][1], outs["unrolled"][1]))
    print(f"# outputs bitwise identical: {same}", file=sys.stderr)
    print(f"# unrolled: {results['unrolled']/results['lax.map']:.3f}x vs lax.map",
          file=sys.stderr)


if __name__ == "__main__":
    main()
