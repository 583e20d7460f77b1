"""Metric-space convergence run (round 5, VERDICT ask #6).

tests/test_e2e_train.py proves loss descends; this proves the REAL training
pipeline — mosaic on, TAL assignment, EMA, per-epoch validator, fitness
checkpointing — converges in METRIC space: mAP50 on a held-out split of a
synthetic solid-shapes dataset (tests/fixtures.make_shapes_dataset: 3
classes — orange rectangle / cyan circle / dark-red rectangle on noise)
rises to >=0.8 from random init within a few hundred steps.

The committed artifact of the run (results.csv + stdout log) lives in
runs/convergence_r5/; the nightly assert is
tests/test_convergence.py::test_shapes_convergence_map50.

Run (real chip or CPU):  python tools/run_convergence.py [epochs] [outdir]
Reference behavior being matched: engine/trainer.py:343-458 epoch loop +
DetectionValidator fitness (metrics.py:758 fitness = mAP50-95).
"""
from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 80
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "runs/convergence_r5"


def main():
    from fixtures import make_shapes_dataset

    from yolo_dbl_tpu.engine.model import YOLO

    tmp = tempfile.mkdtemp(prefix="shapes_")
    data = make_shapes_dataset(Path(tmp) / "ds", n_train=32, n_val=16,
                               imgsz=160, seed=0, max_objects=3)
    model = YOLO("yolov8n.yaml", nc=3)
    t0 = time.time()
    out = model.train(
        data, epochs=EPOCHS, batch=8, imgsz=160, lr0=0.01, patience=EPOCHS + 1,
        mosaic=1.0, close_mosaic=max(EPOCHS // 4, 1), warmup_epochs=3.0,
        project=str(Path(OUTDIR).parent), name=Path(OUTDIR).name,
        exist_ok=True, workers=0, plots=False, verbose=False,
    )
    hist = out["history"]
    for h in hist:
        print(f"epoch {int(h['epoch']):3d}  loss={h.get('loss', float('nan')):7.3f}  "
              f"mAP50={h.get('val_mAP50', 0.0):.4f}  mAP50-95={h.get('val_mAP50-95', 0.0):.4f}",
              flush=True)
    best50 = max(h.get("val_mAP50", 0.0) for h in hist)
    steps = EPOCHS * 4  # 32 imgs / batch 8
    print(f"# best mAP50 = {best50:.4f} over {EPOCHS} epochs (~{steps} steps), "
          f"{time.time() - t0:.0f}s wall, run_dir={out['run_dir']}")
    print(f"# PASS (>=0.8)" if best50 >= 0.8 else "# FAIL (<0.8)")


if __name__ == "__main__":
    main()
