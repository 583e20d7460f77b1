"""Dump the optimized HLO of the b128 infer+NMS step to a file for offline
attribution (round 5: locating the dynamic-update-slice concat chains seen
in the traffic map). Run on the real chip: python tools/exp_hlo_dump.py [out]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from yolo_dbl_tpu.nn.tasks import DetectionModel
    from yolo_dbl_tpu.ops.nms import non_max_suppression

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_b128.txt"
    batch, imgsz = 128, 640
    dtype = jnp.bfloat16
    model = DetectionModel("yolov13s_DBL.yaml", nc=3, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)

    def infer(v, img):
        pred = model.predict(v, img)
        return non_max_suppression(
            pred.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45, max_det=300)

    img = jnp.zeros((batch, imgsz, imgsz, 3), dtype)
    print("# lowering ...", file=sys.stderr, flush=True)
    txt = jax.jit(infer).lower(variables, img).compile().as_text()
    Path(out_path).write_text(txt)
    print(f"# wrote {len(txt)/1e6:.1f} MB to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
