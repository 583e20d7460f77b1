"""Per-component TPU timing for the YOLO-DBL hot path.

VERDICT round 1 flagged that perf work was flying blind — this captures the
measured cost of each stage of the flagship model at its real shapes
(batch 64, 640x640, bf16) on the one real chip.

Harness rules learned the hard way on the axon tunnel:
 - params must be PASSED as jit arguments (device-resident), never closed
   over: closure constants get re-shipped per call (~6x slowdown);
 - outputs must be reduced to scalars INSIDE the jit (retaining n_iters of
   large activations OOMs HBM; fetching big outputs pays tunnel transfer);
 - there is a ~25 ms per-dispatch floor AND a multi-minute process warm-up
   during which timings read 5-100x high. Amortize both: run R sequential
   applications per dispatch via lax.scan, and warm up until two timing
   windows agree.

Run:  python tools/profile_components.py [--batch 64] [--only name,name]
Results are committed to PROFILE.md after each pass.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

DT = jnp.bfloat16


def _scalarize(out):
    return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree_util.tree_leaves(out))


def time_fn(name, fn, params, make_input, reps=8, batch=64):
    """Time fn(params, x): R sequential applications inside one jit, warmed
    until two consecutive windows agree within 15%."""
    xs = jnp.stack([make_input(jax.random.PRNGKey(i)) for i in range(reps)])
    xs = jax.block_until_ready(xs)
    params = jax.block_until_ready(jax.device_put(params))

    def many(p, xs):
        def body(acc, x):
            return acc + _scalarize(fn(p, x)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jitted = jax.jit(many)
    jitted(params, xs).item()  # compile + first execute

    def window(n=2):
        t0 = time.perf_counter()
        for _ in range(n):
            jitted(params, xs).item()
        return (time.perf_counter() - t0) / n

    prev = window()
    for _ in range(12):
        cur = window()
        if abs(cur - prev) / min(cur, prev) < 0.15:
            prev = min(prev, cur)
            break
        prev = cur
    ms = prev / reps * 1000
    print(f"{name:26s} {ms:9.2f} ms/iter  {batch / (prev / reps):9.1f} img/s", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    b = args.batch
    reps = args.reps
    only = set(args.only.split(",")) if args.only else None

    from yolo_dbl_tpu.nn import blocks as B
    from yolo_dbl_tpu.nn.tasks import DetectionModel
    from yolo_dbl_tpu.ops.nms import non_max_suppression

    key = jax.random.PRNGKey(0)

    def run_module(name, mod, shape, reps_=None):
        if only and name not in only:
            return
        v = mod.init(key, jnp.zeros(shape, DT))
        time_fn(name, lambda p, x: mod.apply(p, x), v,
                lambda k: jax.random.uniform(k, shape, DT), reps_ or reps, b)

    def seq(mods):
        class Seq:
            def init(self, key, x):
                vs = []
                for m in mods:
                    v = m.init(key, x)
                    x = m.apply(v, x)
                    vs.append(v)
                return vs

            def apply(self, vs, x):
                for m, v in zip(mods, vs):
                    x = m.apply(v, x)
                return x

        return Seq()

    # ---- full model (no NMS); fewer reps, it's big ----
    if only is None or "model" in only:
        model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=DT)
        variables = model.init(jax.random.PRNGKey(0), imgsz=640)
        time_fn(
            "model_forward(+decode)",
            lambda p, x: model.predict(p, x), variables,
            lambda k: jax.random.uniform(k, (b, 640, 640, 3), DT),
            4, b,
        )

    # ---- NMS alone ----
    if only is None or "nms" in only:
        def make_pred(k):
            p = jax.random.uniform(k, (b, 7, 8400), jnp.float32)
            boxes = p[:, :4] * 640
            scores = p[:, 4:] * 0.6
            return jnp.concatenate([boxes, scores], axis=1)

        time_fn(
            "nms(K=1024)",
            lambda p, pred: non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45, max_det=300),
            jnp.zeros(()), make_pred, reps, b,
        )

    # ---- backbone stages (s-scale channels) ----
    run_module("stem:conv16@640", seq([B.Conv(16, 3, 1, dtype=DT)]), (b, 640, 640, 3), 4)
    run_module("p1:conv32/s2+bneck", seq([B.Conv(32, 3, 2, dtype=DT), B.Bottleneck(32, dtype=DT)]), (b, 640, 640, 16), 4)
    run_module("p2:conv64/s2+bneck", seq([B.Conv(64, 3, 2, dtype=DT), B.Bottleneck(64, dtype=DT)]), (b, 320, 320, 32))
    run_module(
        "p3:conv128/s2+4bneck+pw",
        seq([B.Conv(128, 3, 2, dtype=DT)] + [B.Bottleneck(128, dtype=DT) for _ in range(4)] + [B.Conv(256, 1, 1, dtype=DT)]),
        (b, 160, 160, 64),
    )
    run_module(
        "p4:dsconv+dsc3k2x4",
        seq([B.DSConv(256, 3, 2, dtype=DT), B.DSC3k2(256, n=4, dsc3k=True, dtype=DT)]),
        (b, 80, 80, 256),
    )
    run_module(
        "p5:dsconv+2xLSK",
        seq([B.DSConv(512, 3, 2, dtype=DT), B.LSKblock(512, dtype=DT), B.LSKblock(512, dtype=DT)]),
        (b, 40, 40, 256),
    )
    run_module("lsk_only", seq([B.LSKblock(512, dtype=DT), B.LSKblock(512, dtype=DT)]), (b, 20, 20, 512))

    # ---- head pieces ----
    if only is None or "hyperace" in only:
        hx = B.HyperACE(512, 256, n=1, num_hyperedges=8, dsc3k=True, shortcut=False,
                        e1=0.5, e2=1, context="both", channel_adjust=True, dtype=DT)
        shapes = [(b, 80, 80, 256), (b, 40, 40, 256), (b, 20, 20, 512)]
        v = hx.init(key, [jnp.zeros(s, DT) for s in shapes])

        def mk(k):
            flat = [jax.random.uniform(jax.random.fold_in(k, i), s, DT).reshape(-1) for i, s in enumerate(shapes)]
            return jnp.concatenate(flat)

        def apply_packed(p, packed):
            xs, o = [], 0
            for s in shapes:
                n = 1
                for d in s:
                    n *= d
                xs.append(packed[o:o + n].reshape(s))
                o += n
            return hx.apply(p, xs)

        time_fn("hyperace", apply_packed, v, mk, reps, b)

    run_module("dysample512:20->40", B.DySample(512, 2, "lp", 4, dtype=DT), (b, 20, 20, 512))
    run_module("dysample256:40->80", B.DySample(256, 2, "lp", 4, dtype=DT), (b, 40, 40, 256))


if __name__ == "__main__":
    main()
