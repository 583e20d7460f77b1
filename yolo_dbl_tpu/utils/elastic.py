"""Elastic / preemption-safe training: a supervisor that survives worker death.

TPU pods are routinely preempted (spot quota, maintenance events) and a JAX
runtime crash or OOM takes the whole Python process with it. The reference
has no automatic story — its resume is a manual relaunch flag
(reference engine/trainer.py:692 check_resume). Here recovery is automatic
and total: training runs in a CHILD process; the supervisor watches the
exit code and, on any abnormal death (SIGTERM from a preemption, SIGKILL
from the OOM killer, an XLA runtime abort), relaunches from
``<run_dir>/last.ckpt`` through the facade's bitwise-exact resume path
(engine/model.py train(resume=True), pinned by tests/test_resume.py), with
bounded retries and linear backoff.

The checkpoint is written every epoch by the train loop itself, so the
worst case loses one epoch of work — the same guarantee at any scale
because last.ckpt holds the full TrainState {params, opt_state, EMA,
batch_stats, epoch, best_fitness, train_args}.

Usage::

    from yolo_dbl_tpu.utils.elastic import elastic_train
    out = elastic_train("yolov13s_DBL.yaml", "datasets/tea", nc=3,
                        epochs=300, max_restarts=5)

Child entry point: ``python -m yolo_dbl_tpu.utils.elastic <spec.json>``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path
from typing import Dict, Optional

from .settings import LOGGER


def _run_dir(train_kwargs: Dict) -> Path:
    return Path(train_kwargs.get("project") or "runs") / (
        train_kwargs.get("name") or "train")


def elastic_train(
    model: str,
    data,
    nc: Optional[int] = None,
    max_restarts: int = 3,
    backoff_s: float = 2.0,
    env: Optional[Dict[str, str]] = None,
    _crash_after_epoch: Optional[int] = None,
    **train_kwargs,
) -> Dict:
    """Supervise ``YOLO(model, nc=nc).train(data, **train_kwargs)`` in a child
    process, auto-resuming from last.ckpt on abnormal exit.

    Returns {attempts, restarts, run_dir, returncode}. Raises RuntimeError
    when the child fails more than ``max_restarts`` times.

    ``_crash_after_epoch`` is the fault injector used by the tests: the
    FIRST child kills itself (os._exit) right after that epoch's checkpoint
    is written, emulating a preemption mid-run.
    """
    run_dir = _run_dir(train_kwargs)
    run_dir.mkdir(parents=True, exist_ok=True)
    spec_path = run_dir / "elastic_spec.json"
    marker = run_dir / "elastic_crash_done"  # injector fires once only

    attempts = 0
    while True:
        attempts += 1
        spec = {
            "model": model,
            "nc": nc,
            "data": str(data),
            "train": dict(train_kwargs),
        }
        if (run_dir / "last.ckpt").is_file():
            spec["train"]["resume"] = True
        if _crash_after_epoch is not None and not marker.exists():
            spec["crash_after_epoch"] = int(_crash_after_epoch)
            spec["crash_marker"] = str(marker)
        spec_path.write_text(json.dumps(spec))

        LOGGER.info(
            "elastic: attempt %d/%d (%s)", attempts, max_restarts + 1,
            "resume" if spec["train"].get("resume") else "fresh")
        # the child must find this package regardless of the caller's cwd —
        # prepend the install root to PYTHONPATH
        pkg_root = str(Path(__file__).resolve().parents[2])
        child_env = {**os.environ, **(env or {})}
        child_env["PYTHONPATH"] = os.pathsep.join(
            [pkg_root] + ([child_env["PYTHONPATH"]]
                          if child_env.get("PYTHONPATH") else []))
        rc = subprocess.call(
            [sys.executable, "-m", "yolo_dbl_tpu.utils.elastic", str(spec_path)],
            env=child_env,
        )
        if rc == 0:
            return {"attempts": attempts, "restarts": attempts - 1,
                    "run_dir": str(run_dir), "returncode": 0}
        if attempts > max_restarts:
            raise RuntimeError(
                f"elastic: child failed {attempts} times (last rc={rc}); "
                f"giving up — inspect {run_dir}")
        LOGGER.warning("elastic: child died rc=%d — restarting in %.1fs "
                       "(%s available)", rc, backoff_s,
                       "last.ckpt" if (run_dir / "last.ckpt").is_file()
                       else "no checkpoint")
        time.sleep(backoff_s)


def _child(spec: Dict) -> None:
    """Child-process body: build the facade model and train per spec."""
    from ..engine.model import YOLO

    kw = {"nc": spec["nc"]} if spec.get("nc") is not None else {}
    y = YOLO(spec["model"], **kw)

    crash_epoch = spec.get("crash_after_epoch")
    if crash_epoch is not None:
        marker = Path(spec["crash_marker"])

        def _preempt(epoch=None, **_):
            if epoch == crash_epoch and not marker.exists():
                marker.write_text("crashed")
                os._exit(17)  # hard death, like SIGKILL — no teardown runs

        # on_fit_epoch_end fires AFTER this epoch's last.ckpt exists for
        # epoch-1 but BEFORE this epoch's save → the restart re-trains the
        # crashed epoch, the worst case the supervisor guarantees
        y.add_callback("on_train_epoch_end", _preempt)

    y.train(spec["data"], **spec["train"])


if __name__ == "__main__":
    _child(json.loads(Path(sys.argv[1]).read_text()))
