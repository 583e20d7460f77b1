"""Multi-chip scaling model for the flagship train step (scaling-book style).

Single-chip measurement is all this image allows (one real v5e chip); the
multi-chip story must therefore be a MODEL, built from things we can hold:
the GSPMD-partitioned HLO of the real operating point. This tool AOT-compiles
the yolov13s_DBL@640 b48 train step on the virtual 8-device ('data','model')
mesh (same path as tests/test_flagship_multichip_compile.py), walks the
compiled HLO for collective ops, and prices them against published v5e-8
interconnect numbers:

  * per-chip aggregate ICI bandwidth: 1600 Gbit/s = 200 GB/s (Google v5e
    spec sheet; the 2x2x2 slice is a 2-D torus, all links intra-slice)
  * ring/tree all-reduce cost model: t = 2*(N-1)/N * bytes / BW_per_chip
    (bytes counted once per chip, the standard bidirectional-ring bound)
  * compute leg: the MEASURED single-chip step time (PROFILE.md round-4
    table, 204.0 ms at b48@640 — global batch 8*48=384 under pure DP)

Output: collective inventory (op kind, count, bytes), comm-time estimate per
mesh axis, and the predicted DP-8 scaling efficiency. Labeled model-based
throughout — no multi-chip wall-clock exists to validate it in this image.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python tools/exp_scaling_model.py [dp] [tp]
"""

import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

# one HLO result shape: `bf16[48,640,640,3]{...}` or scalar `f32[]`
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLL = re.compile(
    r"=\s*((?:\([^)]*\)|\S+))\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(", re.M)


def shape_bytes(shape_str):
    total = 0
    for dt, dims in _SHAPE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_inventory(hlo_text):
    """{op kind: (count, total result bytes)} over the optimized HLO."""
    inv = {}
    for shape_str, kind in _COLL.findall(hlo_text):
        cnt, b = inv.get(kind, (0, 0))
        inv[kind] = (cnt + 1, b + shape_bytes(shape_str))
    return inv


def main():
    dp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tp = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from yolo_dbl_tpu.engine.trainer import Trainer
    from yolo_dbl_tpu.nn.tasks import DetectionModel
    from yolo_dbl_tpu.parallel.mesh import make_mesh

    cpus = jax.devices("cpu")
    assert len(cpus) >= dp * tp, "set xla_force_host_platform_device_count"
    mesh = make_mesh(n_data=dp, n_model=tp, devices=cpus[: dp * tp])

    model = DetectionModel("yolov13s_DBL.yaml", nc=80)
    trainer = Trainer(model, overrides={"batch": 48, "imgsz": 640, "epochs": 1},
                      mesh=mesh)
    trainer.setup(steps_per_epoch=1, imgsz=64)

    b, s, m = 48, 640, 32
    batch = {
        "img": jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
        "gt_boxes": jax.ShapeDtypeStruct((b, m, 4), jnp.float32),
        "gt_cls": jax.ShapeDtypeStruct((b, m), jnp.int32),
        "gt_mask": jax.ShapeDtypeStruct((b, m), jnp.float32),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    print(f"# lowering flagship b48@640 train step on {dp}x{tp} mesh ...",
          flush=True)
    compiled = trainer._step_fn.lower(trainer.state, batch, rng).compile()
    hlo = compiled.as_text()
    inv = collective_inventory(hlo)

    param_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(trainer.state.params))
    print(f"# param bytes (dtype as stored): {param_bytes/1e6:.1f} MB")
    print(f"# collectives in optimized HLO ({dp}x{tp} mesh):")
    total_bytes = 0
    for kind, (cnt, byts) in sorted(inv.items()):
        print(f"  {kind:<20} x{cnt:<4} {byts/1e6:10.1f} MB")
        total_bytes += byts
    if not inv:
        print("  (none)")

    # price the dominant term: DP gradient all-reduce over the data axis.
    BW = 200e9  # B/s aggregate ICI per v5e chip (1600 Gbps spec)
    n = dp * tp
    t_comm = 2 * (n - 1) / n * total_bytes / BW
    t_compute = 0.2040  # measured single-chip b48 step (PROFILE.md round 4)
    eff_serial = t_compute / (t_compute + t_comm)
    print(f"# all-reduce ring model: 2(N-1)/N * {total_bytes/1e6:.1f} MB "
          f"/ 200 GB/s = {t_comm*1e3:.2f} ms")
    print(f"# measured single-chip compute leg: {t_compute*1e3:.1f} ms (b48)")
    print(f"# predicted DP-{n} efficiency, zero overlap: {eff_serial:.3f} "
          f"({eff_serial*234.3*n:.0f} img/s on v5e-8)")
    print("# with XLA latency-hiding (grad psum overlapped into bwd): "
          "bounded below by compute leg alone -> ~linear; the zero-overlap "
          "number above is the pessimistic floor.")


if __name__ == "__main__":
    main()
