"""Measured both-stack baseline pairs (BASELINE.md protocol).

Runs the reference's own timing harness (test.py:9 upsample_test /
test.py:42 attention_test; protocol = global_utils/tools.py:110 avg_time —
one untimed warmup call, then N timed calls, device-synced) against the
torch reference AND this repo's JAX modules on the SAME host CPU, same
shapes, same repeat count. The reference publishes no numbers (BASELINE.md),
so these measured pairs are the only like-for-like evidence; the TPU-chip
numbers for our stack live in bench.py / PROFILE.md.

Only reference modules whose forward executes pure torch are paired —
modules that would route through tests/refstub.py Identity stand-ins
(triton SLA, mmcv CARAFE ops, timm blocks) are excluded so no stub output
is ever timed.

Run: JAX_PLATFORMS=cpu python tools/baseline_pairs.py [--repeat N]
Writes the markdown table to stdout; paste into BASELINE.md.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS (tests/conftest.py); pin the
# default device so the "JAX CPU" column really is the host CPU.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

REPEAT = 10
if "--repeat" in sys.argv:
    REPEAT = int(sys.argv[sys.argv.index("--repeat") + 1])


# ---------------------------------------------------------------- torch side
def torch_time(module, *args, repeat=REPEAT):
    """Reference protocol (global_utils/tools.py:110 avg_time): one untimed
    call, then `repeat` timed calls. CPU here, so no cuda sync needed."""
    import torch

    with torch.no_grad():
        module(*args)
        t0 = time.perf_counter()
        for _ in range(repeat):
            out = module(*args)
        dt = (time.perf_counter() - t0) / repeat
    return dt, tuple(out.shape) if hasattr(out, "shape") else None


def torch_catalogue():
    """(name, builder, input_shape_nchw) for reference modules with pure-torch
    forwards. Shapes are the reference's canonical ones (test.py:11,44)."""
    from tests import refstub

    refstub.install_stubs()
    import ultralytics.nn.modules as M  # noqa: reference import — CBAM lives here
    import ultralytics.nn.modules_attention as A  # noqa: reference import
    import ultralytics.nn.modules_upsample as U  # noqa: reference import

    up = (2, 64, 64, 64)  # N C H W — test.py:11
    att = (4, 64, 256, 256)  # test.py:44
    return [
        # upsample pool (test.py:15-31)
        ("DySample", lambda: U.DySample(64), up),
        ("CARAFE", lambda: U.CARAFE(64, 64), up),
        ("EUCB", lambda: U.EUCB(64, 64), up),
        ("MEUM", lambda: U.MEUM(64), up),
        # (reference CARAFEPack routes to the mmcv CUDA op — NotImplementedError
        # on CPU, so no torch-side pair exists for it)
        # attention pool (test.py:46-72)
        ("CBAM", lambda: M.CBAM(64), att),
        ("BAM", lambda: A.BAM(64), att),
        ("CoordAttention", lambda: A.CoordAttention(64, 64), att),
        ("ECALayer", lambda: A.ECALayer(64), att),
        ("EfficientAttention", lambda: A.EfficientAttention(64), att),
        ("EMA", lambda: A.EMA(64), att),
        ("SELayer", lambda: A.SELayer(64), att),
        ("SimAM", lambda: A.SimAM(64), att),
        ("GAM", lambda: A.GAM(64, 64), att),
        ("MLCA", lambda: A.MLCA(64), att),
        ("ELA", lambda: A.ELA(64), att),
    ]


def run_torch():
    import torch

    torch.manual_seed(0)
    rows = {}
    for name, build, shape in torch_catalogue():
        try:
            m = build().eval()
            x = torch.rand(*shape)
            dt, oshape = torch_time(m, x)
            rows[name] = dt
            print(f"[torch] {name:20s} {str(oshape):22s} {dt * 1e3:9.3f} ms", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — catalogue tolerance, like test.py
            print(f"[torch] {name:20s} FAILED {type(e).__name__}: {e}", file=sys.stderr)
    # flagship forward, b1@640 (the e2e unit the reference trains/serves)
    try:
        from tests.refstub import load_reference_model

        ref = load_reference_model(
            "/root/reference/models/YOLO/ultralytics/cfg/models/v13/yolov13_DBL.yaml",
            "s", nc=3,
        ).float().eval()
        x = torch.rand(1, 3, 640, 640)
        dt, _ = torch_time(ref, x, repeat=max(3, REPEAT // 3))
        rows["yolov13s_DBL fwd b1@640"] = dt
        print(f"[torch] yolov13s_DBL fwd     {dt * 1e3:9.1f} ms", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"[torch] flagship FAILED {type(e).__name__}: {e}", file=sys.stderr)
    return rows


# ------------------------------------------------------------------ jax side
def jax_time(fn, *args, repeat=REPEAT):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


def run_jax():
    import jax
    import jax.numpy as jnp

    from yolo_dbl_tpu.nn import attention as A
    from yolo_dbl_tpu.nn import upsample as U
    from yolo_dbl_tpu.nn.blocks import DySample

    up = (2, 64, 64, 64)  # NHWC
    att = (4, 256, 256, 64)
    cat = [
        ("DySample", DySample(64), up),
        ("CARAFE", U.CARAFE(64), up),
        ("EUCB", U.EUCB(64), up),
        ("MEUM", U.MEUM(64), up),
        ("CARAFEPack", U.CARAFEPack(64), up),
        ("CBAM", A.CBAM(64), att),
        ("BAM", A.BAM(64), att),
        ("CoordAttention", A.CoordAttention(64, 64), att),
        ("ECALayer", A.ECALayer(64), att),
        ("EfficientAttention", A.EfficientAttention(64, key_channels=64, head_count=8), att),
        ("EMA", A.EMA(64, factor=8), att),
        ("SELayer", A.SELayer(64), att),
        ("SimAM", A.SimAM(64), att),
        ("GAM", A.GAM(64, 64), att),
        ("MLCA", A.MLCA(64), att),
        ("ELA", A.ELA(64), att),
    ]
    rows = {}
    for name, module, shape in cat:
        try:
            x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32)
            v = module.init(jax.random.PRNGKey(0), x)
            fn = jax.jit(lambda vv, xx, _m=module: _m.apply(vv, xx))
            dt = jax_time(fn, v, x)
            rows[name] = dt
            print(f"[jax]   {name:20s} {dt * 1e3:9.3f} ms", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"[jax]   {name:20s} FAILED {type(e).__name__}: {e}", file=sys.stderr)

    from yolo_dbl_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov13s_DBL.yaml", nc=3)
    v = model.init(jax.random.PRNGKey(0), imgsz=640)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 640, 640, 3), jnp.float32)
    fn = jax.jit(lambda vv, xx: model.predict(vv, xx))
    dt = jax_time(fn, v, x, repeat=max(3, REPEAT // 3))
    rows["yolov13s_DBL fwd b1@640"] = dt
    print(f"[jax]   yolov13s_DBL fwd     {dt * 1e3:9.1f} ms", file=sys.stderr)
    return rows


def main():
    t = run_torch()
    j = run_jax()
    print("\n| module | torch CPU (ms) | JAX CPU (ms) | JAX/torch |")
    print("|---|---|---|---|")
    for name in t:
        if name in j:
            ratio = j[name] / t[name]
            print(f"| {name} | {t[name] * 1e3:.3f} | {j[name] * 1e3:.3f} | {ratio:.2f}× |")


if __name__ == "__main__":
    main()
