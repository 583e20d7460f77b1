"""Generic config-dict trainer for the classical detector zoo.

Equivalent of the reference's global_utils Trainer (train_utils.py:79):
SGD + cosine annealing + per-iteration linear warmup, grad-clip 10.0,
per-epoch COCO evaluation with a 12-stat csv row, EarlyStopping on mAP,
parameter-count report, args.yaml dump, best/last checkpoints. bf16/AMP is
the `dtype` the detector was built with (XLA-managed — no GradScaler).

Works over a detector adapter exposing:
    init(rng) -> variables
    loss(variables, batch, rng, train, mutable) -> (total, items[, aux])
    predict(variables, img) -> (dets (B, K, 6), num_valid (B,))
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from ..utils.checkpoint import save_deploy
from ..utils.metrics import COCO_STAT_NAMES, COCOEvaluator, DetMetrics
from .tools import find_new_dir


class EarlyStopping:
    """patience/delta, min-or-max, tracks best (reference train_utils.py:23)."""

    def __init__(self, patience=10, delta=0.0, mode="max"):
        self.patience = patience
        self.delta = delta
        self.mode = mode
        self.best = None
        self.counter = 0
        self.improved = False

    def update(self, value) -> bool:
        """Returns True when training should stop."""
        better = (
            self.best is None
            or (self.mode == "max" and value > self.best + self.delta)
            or (self.mode == "min" and value < self.best - self.delta)
        )
        self.improved = better
        if better:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
        return self.counter >= self.patience


DEFAULT_CFG = {
    "epochs": 50,
    "batch_size": 8,
    "img_size": 300,
    "lr": 0.01,
    "momentum": 0.9,
    "weight_decay": 5e-4,
    "warmup_epochs": 1,
    "patience": 10,
    "min_score": 0.01,
    "save_dir": "runs/classical",
    "name": "exp",
}


class Trainer:
    def __init__(self, detector, train_loader, val_loader, nc: int, cfg: Optional[Dict] = None):
        self.detector = detector
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.nc = nc
        self.cfg = {**DEFAULT_CFG, **(cfg or {})}
        self.run_dir = find_new_dir(self.cfg["save_dir"], self.cfg["name"])
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.stopper = EarlyStopping(patience=self.cfg["patience"], mode="max")

        steps_per_epoch = max(len(train_loader), 1)
        warmup = max(int(self.cfg["warmup_epochs"] * steps_per_epoch), 1)
        total = self.cfg["epochs"] * steps_per_epoch
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(self.cfg["lr"] / 100, self.cfg["lr"], warmup),
                optax.cosine_decay_schedule(self.cfg["lr"], max(total - warmup, 1)),
            ],
            [warmup],
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.add_decayed_weights(self.cfg["weight_decay"]),
            optax.trace(decay=self.cfg["momentum"], nesterov=True),
            optax.scale_by_learning_rate(schedule),
        )
        self.variables = None
        self.opt_state = None
        self._jit_step = None

    def dump_args(self):
        """args.yaml dump (reference train_utils.py:235)."""
        with open(self.run_dir / "args.yaml", "w") as f:
            yaml.safe_dump(self.cfg, f)

    def _make_step(self):
        detector, tx = self.detector, self.tx

        def step(params, extra, opt_state, batch, rng):
            from ..kernels.preprocess import device_normalize

            batch = {**batch, "img": device_normalize(batch["img"])}

            def loss_fn(p):
                variables = {"params": p, **extra}
                out = detector.loss(variables, batch, rng=rng, train=True, mutable=["batch_stats"])
                total, items, aux = out
                return total, (items, aux.get("batch_stats", extra.get("batch_stats")))

            (total, (items, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt, total, items

        return jax.jit(step, donate_argnums=(0, 2))

    def start_training(self) -> Dict:
        """Epoch loop (reference train_utils.py:177)."""
        cfg = self.cfg
        rng = jax.random.PRNGKey(0)
        if self.variables is None:
            self.variables = self.detector.init(rng)
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(self.variables["params"]))
        print(f"model parameters: {n_params / 1e6:.2f}M")
        self.dump_args()
        params = self.variables["params"]
        extra = {k: v for k, v in self.variables.items() if k != "params"}
        self.opt_state = self.tx.init(params)
        self._jit_step = self._make_step()

        history = []
        for epoch in range(cfg["epochs"]):
            t0 = time.time()
            running, n = 0.0, 0
            for batch in self.train_loader:
                rng, sub = jax.random.split(rng)
                jb = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("labels", "indices")}
                params, new_stats, self.opt_state, total, items = self._jit_step(
                    params, extra, self.opt_state, jb, sub
                )
                if new_stats is not None:
                    extra = {**extra, "batch_stats": new_stats}
                running += float(total)
                n += 1
            self.variables = {"params": params, **extra}
            stats = self.evaluate()
            mAP = stats.get("AP", stats.get("mAP50-95", 0.0))
            row = {"epoch": epoch, "train_loss": running / max(n, 1), "seconds": time.time() - t0, **stats}
            history.append(row)
            self._append_coco_csv(stats)
            stop = self.stopper.update(mAP)
            if self.stopper.improved:
                save_deploy(self.run_dir / "best.ckpt", self.variables, nc=self.nc)
            save_deploy(self.run_dir / "last.ckpt", self.variables, nc=self.nc)
            if stop:
                break
        return {"history": history, "best_mAP": self.stopper.best, "run_dir": str(self.run_dir)}

    def evaluate(self) -> Dict:
        """Per-epoch COCO eval (reference train_utils via coco.py:83)."""
        coco = COCOEvaluator(self.nc, min_score=self.cfg["min_score"])
        predict = jax.jit(lambda v, x: self.detector.predict(v, x))
        for batch in self.val_loader:
            from ..kernels.preprocess import device_normalize

            dets, num = jax.device_get(predict(
                self.variables, device_normalize(jnp.asarray(batch["img"]))))
            for i in range(len(dets)):
                k = int(num[i])
                lab = batch["labels"][i] if "labels" in batch else None
                if lab is not None:
                    gt_boxes, gt_cls = lab["boxes"], lab["cls"]
                else:
                    m = batch["gt_mask"][i].astype(bool)
                    s = batch["img"].shape[1]
                    from ..ops.boxes import xywh2xyxy

                    gt_boxes = np.asarray(xywh2xyxy(jnp.asarray(batch["gt_boxes"][i][m]))) * s
                    gt_cls = batch["gt_cls"][i][m]
                coco.update(dets[i][:k], np.asarray(gt_boxes), np.asarray(gt_cls))
        return coco.summarize()

    def _append_coco_csv(self, stats: Dict):
        """coco_stats.csv append (reference coco.py:147)."""
        path = self.run_dir / "coco_stats.csv"
        write_header = not path.exists()
        with open(path, "a") as f:
            if write_header:
                f.write(",".join(COCO_STAT_NAMES) + "\n")
            f.write(",".join(f"{stats.get(k, -1):.5f}" for k in COCO_STAT_NAMES) + "\n")


def default_val(detector, variables, val_loader, nc: int, min_score=0.01) -> Dict:
    """Standalone evaluation (reference train_utils.py:263 default_val)."""
    coco = COCOEvaluator(nc, min_score=min_score)
    predict = jax.jit(lambda v, x: detector.predict(v, x))
    for batch in val_loader:
        from ..kernels.preprocess import device_normalize

        dets, num = jax.device_get(predict(variables, device_normalize(jnp.asarray(batch["img"]))))
        for i in range(len(dets)):
            k = int(num[i])
            lab = batch["labels"][i]
            coco.update(dets[i][:k], np.asarray(lab["boxes"]), np.asarray(lab["cls"]))
    return coco.summarize()


def default_detect(detector, variables, images: Iterable[np.ndarray], img_size: int,
                   conf=0.5) -> Dict:
    """Per-image inference with trimmed-mean latency (reference
    train_utils.py:295 default_detect, :352-362 latency protocol)."""
    import cv2

    predict = jax.jit(lambda v, x: detector.predict(v, x))
    times, results = [], []
    for img in images:
        h, w = img.shape[:2]
        resized = cv2.resize(img, (img_size, img_size)).astype(np.float32) / 255.0
        t0 = time.perf_counter()
        dets, num = jax.device_get(predict(variables, jnp.asarray(resized)[None]))
        times.append(time.perf_counter() - t0)
        k = int(num[0])
        d = np.asarray(dets[0][:k], dtype=np.float64)
        d[:, [0, 2]] *= w / img_size
        d[:, [1, 3]] *= h / img_size
        results.append(d[d[:, 4] >= conf])
    trimmed = sorted(times)[1:-1] if len(times) > 2 else times
    return {
        "results": results,
        "latency_ms": float(np.mean(trimmed) * 1000) if trimmed else 0.0,
    }
