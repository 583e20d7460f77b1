"""CLI entrypoint: `python -m yolo_dbl_tpu <task> <mode> k=v ...`.

Equivalent of the reference's `yolo` console entrypoint
(cfg/__init__.py:817): `yolo detect train data=... model=... epochs=...`
with smart k=v parsing, plus `checks` and `settings` subcommands.
"""

from __future__ import annotations

import ast
import sys
from typing import Dict, List


def parse_kv(args: List[str]) -> Dict:
    out = {}
    for a in args:
        if "=" not in a:
            raise SystemExit(f"expected key=value, got '{a}'")
        k, v = a.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


HELP = """yolo_dbl_tpu CLI — TPU-native YOLO-DBL framework

usage: python -m yolo_dbl_tpu [task] [mode] [key=value ...]

tasks: detect (default), segment, pose, obb, classify — inferred from the
       model yaml's head; the task token is accepted for reference-CLI parity
modes: train, val, predict, track, export, benchmark, tune

examples:
  python -m yolo_dbl_tpu detect train data=path/to/dataset model=yolov13s_DBL.yaml epochs=100
  python -m yolo_dbl_tpu detect val model=runs/train/best.ckpt data=path/to/dataset
  python -m yolo_dbl_tpu detect predict model=best.ckpt source=images/
  python -m yolo_dbl_tpu detect track model=best.ckpt source=video.mp4 tracker=bytetrack.yaml
  python -m yolo_dbl_tpu detect export model=best.ckpt format=stablehlo
  python -m yolo_dbl_tpu detect tune model=yolov8n.yaml data=path/to/dataset iterations=10
  python -m yolo_dbl_tpu benchmark
  python -m yolo_dbl_tpu checks
  python -m yolo_dbl_tpu settings [key=value ...]
  python -m yolo_dbl_tpu solutions
"""


def entrypoint(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("help", "--help", "-h"):
        print(HELP)
        return
    if argv[0] == "checks":
        import jax

        print("devices:", jax.devices())
        print("default backend:", jax.default_backend())
        from . import __version__

        print("yolo_dbl_tpu:", __version__)
        return
    if argv[0] == "settings":
        from .utils.settings import SETTINGS

        updates = parse_kv(argv[1:])
        for k, v in updates.items():
            SETTINGS[k] = v
        for k, v in dict(SETTINGS).items():
            print(f"{k}={v}")
        return
    if argv[0] == "solutions":
        from . import solutions

        print("available solutions apps (yolo_dbl_tpu.solutions):")
        for name in solutions.__all__:
            print(" ", name)
        return
    if argv[0] == "benchmark":
        import runpy
        from pathlib import Path

        bench = Path(__file__).resolve().parent.parent / "bench.py"
        runpy.run_path(str(bench), run_name="__main__")
        return

    task = "detect"
    if argv and argv[0] in ("detect", "segment", "pose", "obb", "classify"):
        task = argv.pop(0)
    if not argv:
        raise SystemExit("missing mode; " + HELP)
    mode = argv.pop(0)
    kv = parse_kv(argv)

    from .engine.model import YOLO

    model_arg = kv.pop("model", "yolov13s_DBL.yaml")
    nc = kv.pop("nc", None)
    y = YOLO(model_arg, nc=nc)

    if mode == "train":
        data = kv.pop("data")
        out = y.train(data, **kv)
        print(f"best fitness: {out['best_fitness']:.4f}  run dir: {out['run_dir']}")
    elif mode == "val":
        data = kv.pop("data")
        stats = y.val(data, **kv)
        keys = ("mAP50", "mAP50-95", "precision", "recall")
        print({k: round(stats[k], 4) for k in keys if k in stats})
        if "coco_stats" in stats:
            print({k: round(v, 4) for k, v in stats["coco_stats"].items()})
    elif mode == "predict":
        source = kv.pop("source")
        results = y.predict(source, **kv)
        for r in results:
            print(r.path, len(r), "detections")
            for d in r.to_json_dicts():
                print("  ", d)
    elif mode == "track":
        source = kv.pop("source")
        results = y.track(source, **kv)
        for r in results:
            ids = r.boxes.id if r.boxes is not None and r.boxes.is_track else None
            print(r.path, len(r), "tracks", None if ids is None else [int(i) for i in ids])
    elif mode == "export":
        from .engine.exporter import Exporter

        fmt = kv.pop("format", "stablehlo")
        imgsz = kv.pop("imgsz", 640)
        exporter = Exporter(y.model, y._ensure_variables(imgsz), imgsz=imgsz, **kv)
        path = exporter(fmt)
        print("exported:", path)
    elif mode == "tune":
        data = kv.pop("data")
        iterations = kv.pop("iterations", 10)
        out = y.tune(data, iterations=iterations, **kv)
        print("best fitness:", round(out["best_fitness"], 4))
        print("best hyp:", out["best_hyp"])
    else:
        raise SystemExit(f"unknown mode '{mode}'; " + HELP)


if __name__ == "__main__":
    entrypoint()
