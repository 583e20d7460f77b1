"""Backward-pass decomposition of the yolov13s_DBL train step (VERDICT r2 #1).

Round 2 profiled the forward the hard way (tools/exp_hyperace.py et al.);
this does the same for training: where do 1.96 s/step at b16@640 go?

Stages timed independently (slope-timed scans, distinct inputs, scalar out):
  fwd           model forward, train=False
  grad_model    d(sum outputs)/d(params) through the full model (no loss)
  loss_fwd      detection_loss on random feature maps (TAL + CIoU + DFL)
  grad_loss     d loss / d feats (assigner is stop-gradient; bbox/cls grads)
  full_step     the real Trainer step (fwd + loss + bwd + optax + EMA)
  grad:<module> per-module value_and_grad at the module's in-model shape

Run:  python tools/exp_train_breakdown.py [--batch 16] [--only a,b]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16


def _scalarize(out):
    return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree_util.tree_leaves(out))


def time_fn(name, fn, params, make_input, reps=6, batch=16):
    """Same discipline as tools/profile_components.py: R sequential
    applications inside one jit over distinct stacked inputs, warmed until
    two windows agree within 15%."""
    xs = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves),
        *[make_input(jax.random.PRNGKey(i)) for i in range(reps)])
    xs = jax.block_until_ready(xs)
    params = jax.block_until_ready(jax.device_put(params))

    def many(p, xs):
        def body(acc, x):
            return acc + _scalarize(fn(p, x)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jitted = jax.jit(many)
    jitted(params, xs).item()

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
    print(f"{name:30s} {ms:9.2f} ms/iter  {batch / (prev / reps):9.1f} img/s", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    b, imgsz, reps = args.batch, args.imgsz, args.reps
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    from yolo_dbl_tpu.losses.detection import detection_loss
    from yolo_dbl_tpu.nn import blocks as B
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    key = jax.random.PRNGKey(0)
    model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=DT)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    max_gt = 16

    def mkimg(k):
        return jax.random.uniform(k, (b, imgsz, imgsz, 3), DT)

    def mkbatch(k):
        return {
            "img": jax.random.uniform(k, (b, imgsz, imgsz, 3), jnp.float32),
            "gt_boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]], jnp.float32), (b, max_gt, 1)),
            "gt_cls": jnp.zeros((b, max_gt), jnp.int32),
            "gt_mask": jnp.pad(jnp.ones((b, 2), jnp.float32), ((0, 0), (0, max_gt - 2))),
        }

    # ---- forward ----
    if want("fwd"):
        time_fn("fwd(train=False)",
                lambda p, x: model.module.apply(p, x, train=False), variables, mkimg, reps, b)

    # ---- backward through the model only (no loss) ----
    if want("grad_model"):
        def fwd_sum(params, x, stats):
            out, _ = model.module.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
            return _scalarize(out)

        stats = variables["batch_stats"]

        def gm(p, x):
            return jax.grad(fwd_sum)(p["params"], x, p["batch_stats"])

        time_fn("grad_model(no loss)", gm, variables, mkimg, reps, b)

    # ---- loss alone on random feats at real shapes ----
    strides = model.strides
    nc = model.nc
    feat_shapes = [(b, imgsz // s, imgsz // s, 4 * 16 + nc) for s in strides]

    def mkfeats(k):
        return tuple(jax.random.normal(jax.random.fold_in(k, i), s, jnp.float32)
                     for i, s in enumerate(feat_shapes))

    if want("loss_fwd"):
        batch0 = mkbatch(jax.random.PRNGKey(99))
        time_fn("loss_fwd(TAL+CIoU+DFL)",
                lambda p, f: detection_loss(list(f), batch0, strides, nc)[0],
                jnp.zeros(()), mkfeats, reps, b)

    if want("grad_loss"):
        batch0 = mkbatch(jax.random.PRNGKey(99))

        def gl(p, f):
            return jax.grad(lambda ff: detection_loss(list(ff), batch0, strides, nc)[0])(f)

        time_fn("grad_loss(d/dfeats)", gl, jnp.zeros(()), mkfeats, reps, b)

    # ---- the real train step ----
    if want("full_step"):
        from yolo_dbl_tpu.engine.trainer import Trainer

        trainer = Trainer(model, overrides={"batch": b, "imgsz": imgsz, "epochs": 1})
        trainer.setup(steps_per_epoch=100, imgsz=imgsz)
        state = trainer.state
        step = trainer._step_fn
        rngk = jax.random.PRNGKey(0)

        # can't scan a full state update easily with time_fn; measure directly
        bt = [jax.block_until_ready(
            jax.tree_util.tree_map(jnp.asarray, mkbatch(jax.random.PRNGKey(i))))
            for i in range(reps)]
        st, m = step(state, bt[0], rngk)
        jax.block_until_ready(m["loss"])  # compile

        def window():
            nonlocal st
            t0 = time.perf_counter()
            for bb in bt:
                st, m = step(st, bb, rngk)
                _ = float(m["loss"])
            return (time.perf_counter() - t0) / reps

        prev = window()
        for _ in range(6):
            cur = window()
            if abs(cur - prev) / min(cur, prev) < 0.15:
                prev = min(prev, cur)
                break
            prev = cur
        print(f"{'full_step':30s} {prev * 1000:9.2f} ms/iter  {b / prev:9.1f} img/s", flush=True)

    # ---- per-module grads at in-model shapes (s-scale) ----
    def grad_module(name, mod, shape, reps_=None, multi=False):
        if not want(name):
            return
        xz = [jnp.zeros(s, DT) for s in shape] if multi else jnp.zeros(shape, DT)
        v = mod.init(key, xz)

        if multi:
            def mk(k):
                return tuple(jax.random.uniform(jax.random.fold_in(k, i), s, DT)
                             for i, s in enumerate(shape))

            def g(p, x):
                return jax.grad(lambda pp: _scalarize(mod.apply(pp, list(x))))(p)
        else:
            def mk(k):
                return jax.random.uniform(k, shape, DT)

            def g(p, x):
                return jax.grad(lambda pp: _scalarize(mod.apply(pp, x)))(p)

        time_fn(f"grad:{name}", g, v, mk, reps_ or reps, b)

    grad_module("stem_conv16@640", B.Conv(16, 3, 1, dtype=DT), (b, imgsz, imgsz, 3), 4)
    grad_module("conv32s2@640", B.Conv(32, 3, 2, dtype=DT), (b, imgsz, imgsz, 16), 4)
    grad_module("bneck128@160", B.Bottleneck(128, dtype=DT), (b, 160, 160, 64))
    grad_module("dsconv256@160", B.DSConv(256, 3, 2, dtype=DT), (b, 160, 160, 256))
    grad_module("dsc3k2@80", B.DSC3k2(256, n=4, dsc3k=True, dtype=DT), (b, 80, 80, 256))
    grad_module("lsk512@20", B.LSKblock(512, dtype=DT), (b, 20, 20, 512))
    # DySample has two sampling paths: gather (train=True) vs one-hot matmul
    # (train=False, jax.checkpoint'ed chunks) — time the BACKWARD of both
    for nm, shape in (("dysample512:20->40", (b, 20, 20, 512)),
                      ("dysample256:40->80", (b, 40, 40, 256))):
        mod = B.DySample(shape[-1], 2, "lp", 4, dtype=DT)
        if want(nm):
            v = mod.init(key, jnp.zeros(shape, DT))
            for label, trainflag in ((f"grad:{nm}[gather]", True),
                                     (f"grad:{nm}[onehot]", False)):
                time_fn(label,
                        lambda p, x, tf=trainflag: jax.grad(
                            lambda pp: _scalarize(mod.apply(pp, x, train=tf)))(p),
                        v, lambda k: jax.random.uniform(k, shape, DT), reps, b)
    grad_module("hyperace", B.HyperACE(512, 256, n=1, num_hyperedges=8, dsc3k=True,
                                       shortcut=False, e1=0.5, e2=1, context="both",
                                       channel_adjust=True, dtype=DT),
                [(b, 80, 80, 256), (b, 40, 40, 256), (b, 20, 20, 512)], multi=True)


if __name__ == "__main__":
    main()
