"""Runtime sanity checks (reference utils/checks.py).

The torch reference's checks are mostly environment probes (CUDA, pip
versions) that have no TPU analogue; the behavioral ones reproduced here:

- check_imgsz (checks.py check_imgsz): round the requested image size up to
  a multiple of the model's max stride, warn on change — surfaced at the
  facade so YOLO.train/val/predict never feed a stride-misaligned size into
  a fixed-shape jit program;
- check_amp (checks.py:649) analogue: compare an fp32 vs bf16 forward on a
  dummy batch and report max deviation, so callers can gate mixed precision.
"""

from __future__ import annotations

import logging
import math
from typing import Sequence, Union

LOGGER = logging.getLogger("yolo_dbl_tpu")


def check_imgsz(imgsz: Union[int, Sequence[int]], stride: int = 32,
                min_dim: int = 0, floor: int = 0) -> Union[int, list]:
    """Round image size(s) UP to the nearest multiple of stride (reference
    checks.py check_imgsz semantics: ceil to grid, warn when changed)."""
    stride = int(stride)

    def fix(v: int) -> int:
        v = max(int(v), floor)
        new = max(math.ceil(v / stride) * stride, floor)
        if new != v:
            LOGGER.warning("imgsz=%d is not a multiple of max stride %d, updating to %d",
                           v, stride, new)
        return new

    if isinstance(imgsz, (list, tuple)):
        out = [fix(v) for v in imgsz]
        return out if min_dim != 1 else out[0]
    return fix(imgsz)


def check_amp(model, variables, imgsz: int = 64, box_tol: float = 0.02,
              score_tol: float = 0.05) -> bool:
    """bf16-safety probe (reference check_amp, checks.py:649, runs the same
    image through fp16 and fp32 inference and compares detections for real —
    'close_fp16' boxes + scores). TPU analogue on the decoded (4+nc, A) maps:

    - class-score channels are sigmoid-bounded [0,1] → absolute tolerance
      `score_tol` (reference uses 0.1 on conf);
    - box channels are pixel units → tolerance `box_tol` relative to imgsz.

    Returns True when bf16 inference is detection-equivalent to fp32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, imgsz, imgsz, 3), jnp.float32)
    full = np.asarray(model.predict(variables, x))
    half = np.asarray(model.predict(variables, x.astype(jnp.bfloat16)).astype(jnp.float32))
    box_dev = float(np.abs(full[:, :4] - half[:, :4]).max() / imgsz)
    score_dev = float(np.abs(full[:, 4:] - half[:, 4:]).max())
    ok = box_dev < box_tol and score_dev < score_tol
    if not ok:
        LOGGER.warning(
            "bf16 forward deviates from fp32 (box %.4f of imgsz, tol %.3f; "
            "score %.4f, tol %.3f) — falling back to fp32 is recommended",
            box_dev, box_tol, score_dev, score_tol)
    return ok
