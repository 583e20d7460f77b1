"""YOLO user-facing model facade.

Equivalent of the reference's Model/YOLO facade (engine/model.py:31,
models/yolo/model.py:14): one object holding config + parameters with
train/val/predict entry points. Checkpoints are the framework's own deploy
blobs (utils/checkpoint.py) instead of torch .pt.
"""

from __future__ import annotations

import math
import time
from pathlib import Path
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import get_cfg
from ..data.build import DataLoader
from ..data.dataset import YOLODataset
from ..nn.tasks import DetectionModel
from ..utils.checkpoint import load_deploy, peek_checkpoint_meta, save_checkpoint, save_deploy
from ..utils.checks import check_imgsz
from .predictor import DetectionPredictor
from .trainer import Trainer
from .validator import DetectionValidator


class YOLO:
    """`YOLO('yolov13s_DBL.yaml')` or `YOLO('runs/exp/best.ckpt')`."""

    def __init__(self, model: Union[str, Path] = "yolov13s_DBL.yaml", nc: Optional[int] = None,
                 dtype=jnp.float32):
        model = str(model)
        self.ckpt_meta = None
        if model.endswith((".ckpt", ".pkl", ".bin")):
            import pickle

            with open(model, "rb") as f:
                blob = pickle.load(f)
            cfg_dict = blob["model_yaml"]
            self.model = DetectionModel(cfg_dict, nc=blob.get("nc"), dtype=dtype)
            template = self.model.init(jax.random.PRNGKey(0), imgsz=64)
            self.variables, self.ckpt_meta = load_deploy(model, template)
        else:
            from ..nn.tasks import ClassificationModel, WorldModel

            stem = Path(model).stem.lower()
            if "cls" in stem:
                self.model = ClassificationModel(model, nc=nc, dtype=dtype)
            elif "world" in stem:
                self.model = WorldModel(model, nc=nc, dtype=dtype)
            else:
                self.model = DetectionModel(model, nc=nc, dtype=dtype)
            self.variables = None
        self.trainer: Optional[Trainer] = None
        from ..utils.callbacks import Callbacks

        self.callbacks = Callbacks()

    def add_callback(self, event: str, fn):
        """Register a hook (reference Model.add_callback, engine/model.py:919);
        see utils/callbacks.HOOKS for event names, and
        `callbacks.integrate('tensorboard' | 'jsonl', ...)` for built-in sinks."""
        self.callbacks.add(event, fn)

    @property
    def task(self) -> str:
        """Task inferred from the head (reference guess_model_task)."""
        return {
            "Segment": "segment", "Pose": "pose", "OBB": "obb",
            "Classify": "classify", "RTDETRDecoder": "detect",
        }.get(getattr(self.model, "head_name", "Detect"), "detect")

    # ------------------------------------------------------------------ utils
    @property
    def nc(self):
        return self.model.nc

    @property
    def names(self):
        return self.model.names

    def info(self):
        return self.model.info(self.variables)

    def _make_validator(self, **kw):
        """Task-matched validator (reference task→Validator map)."""
        from .validator import (DetectionValidator, OBBValidator, PoseValidator,
                                SegmentationValidator)

        t = self.task
        if t == "segment":
            return SegmentationValidator(self.model, **kw)
        if t == "pose":
            return PoseValidator(self.model, kpt_shape=tuple(
                self.model.yaml.get("kpt_shape", (17, 3))), **kw)
        if t == "obb":
            return OBBValidator(self.model, **kw)
        return DetectionValidator(self.model, **kw)

    def _ensure_variables(self, imgsz=640):
        if self.variables is None:
            self.variables = self.model.init(jax.random.PRNGKey(0), imgsz=imgsz)
        return self.variables

    # ------------------------------------------------------------------ train
    def train(self, data: Union[str, Path], mesh=None, **overrides) -> Dict:
        """Train on a YOLO-format dataset directory. Returns final metrics.

        Mirrors reference Model.train → BaseTrainer flow: dataloaders, warmup
        schedules, EMA, per-epoch val with fitness-based best checkpointing,
        patience early stop, close_mosaic switch.
        """
        resume = overrides.get("resume", False)
        ckpt_path = None
        if resume:
            # reference check_resume (engine/trainer.py:692): train args come
            # from the checkpoint unless explicitly overridden this call, and
            # they must be merged BEFORE the datasets, loaders, and optimizer
            # schedule are built so imgsz/batch/lr0/epochs take effect
            probe = get_cfg(overrides={k: v for k, v in overrides.items()})
            probe_dir = Path(probe.project or "runs") / (probe.name or "train")
            ckpt_path = Path(resume) if isinstance(resume, (str, Path)) else probe_dir / "last.ckpt"
            if not ckpt_path.is_file():
                raise FileNotFoundError(f"resume checkpoint not found: {ckpt_path}")
            restored = {k: v for k, v in (peek_checkpoint_meta(ckpt_path)["train_args"] or {}).items()
                        if k != "resume" and hasattr(probe, k)}
            restored.update(overrides)  # explicit args this call win
            overrides = restored
        cfg = get_cfg(overrides={k: v for k, v in overrides.items()})
        from ..utils import set_verbosity

        set_verbosity(bool(cfg.verbose))
        self.callbacks.run("on_pretrain_routine_start", model=self, cfg=cfg)
        cfg.imgsz = check_imgsz(cfg.imgsz, stride=max(self.model.strides, default=1))
        names = overrides.get("names")
        task = self.task
        # single_cls: all objects become class 0 (reference BaseDataset
        # update_labels); fraction: train on the first fraction of images
        train_ds = YOLODataset(data, split="train", imgsz=cfg.imgsz, task=task,
                               single_cls=cfg.single_cls, fraction=cfg.fraction,
                               cache_images=cfg.cache)
        try:
            val_ds = YOLODataset(data, split="val", imgsz=cfg.imgsz, task=task,
                                 single_cls=cfg.single_cls, cache_images=cfg.cache)
        except FileNotFoundError:
            val_ds = train_ds
        hyp = {k: getattr(cfg, k) for k in
               ("mosaic", "mixup", "copy_paste", "copy_paste_mode", "degrees", "translate",
                "scale", "shear", "perspective", "hsv_h", "hsv_s", "hsv_v", "fliplr",
                "flipud", "bgr", "erasing") if hasattr(cfg, k)}
        workers = int(getattr(cfg, "workers", 0) or 0)
        train_loader = DataLoader(train_ds, batch_size=cfg.batch, imgsz=cfg.imgsz, augment=True,
                                  hyp=hyp, seed=cfg.seed, task=task, workers=workers)
        val_loader = DataLoader(val_ds, batch_size=cfg.batch, imgsz=cfg.imgsz, augment=False,
                                shuffle=False, drop_last=False, task=task, workers=workers)

        trainer = Trainer(self.model, overrides=dict(overrides), mesh=mesh)
        trainer.setup(steps_per_epoch=max(len(train_loader), 1))
        self.trainer = trainer
        validator = self._make_validator()

        if resume:
            run_dir = ckpt_path.parent
        else:
            # reference get_save_dir: auto-increment train2, train3, … unless
            # exist_ok (utils/files.py increment_path)
            from ..utils.files import increment_path

            run_dir = increment_path(Path(cfg.project or "runs") / (cfg.name or "train"),
                                     exist_ok=cfg.exist_ok)
        run_dir.mkdir(parents=True, exist_ok=True)
        best_fitness, best_epoch = -1.0, -1
        start_epoch = 0
        if resume:
            # reference resume_training (engine/trainer.py:724): restore
            # params/opt_state/EMA/epoch/best_fitness from last.ckpt and
            # continue the schedule (train args were merged before the
            # loaders/optimizer were built, top of this method)
            meta = trainer.restore(ckpt_path)
            best_fitness = float(meta["best_fitness"])
            best_epoch = int(meta.get("best_epoch", -1))
            start_epoch = int(meta.get("epoch", -1)) + 1
            train_loader.set_epoch(start_epoch)
        history = []
        rng = jax.random.PRNGKey(cfg.seed)
        mosaic_closed = False
        self.callbacks.run("on_pretrain_routine_end", model=self, cfg=cfg)
        self.callbacks.run("on_train_start", model=self, cfg=cfg)
        for epoch in range(start_epoch, cfg.epochs):
            self.callbacks.run("on_train_epoch_start", model=self, epoch=epoch)
            if cfg.close_mosaic and not mosaic_closed and epoch >= cfg.epochs - cfg.close_mosaic:
                train_loader.close_mosaic()
                mosaic_closed = True
            t0 = time.time()
            running, count = {}, 0
            if cfg.multi_scale:
                from ..data.rect import multi_scale_sizes, resize_batch, sample_scale

                ms_sizes = multi_scale_sizes(cfg.imgsz, max(self.model.strides, default=1))
                ms_rng = np.random.default_rng(cfg.seed + epoch)
            # chunk batches into one scan dispatch per scan_steps (the
            # per-dispatch overhead fix, engine/trainer.py make_train_scan);
            # multi_scale varies shapes per batch → per-step path
            pending = []
            chunk = 1 if cfg.multi_scale else trainer.scan_steps

            def flush():
                nonlocal count
                if not pending:
                    return
                if len(pending) == chunk and chunk > 1:
                    rows = [trainer.step_many(pending, rng)]
                else:
                    rows = [trainer.step(b, rng) for b in pending]
                for ms in rows:
                    for k, v in ms.items():
                        running[k] = running.get(k, 0.0) + float(np.asarray(v).sum())
                count += len(pending)
                pending.clear()

            for batch in train_loader:
                if cfg.multi_scale:
                    batch = dict(batch)
                    batch["img"] = resize_batch(batch["img"], sample_scale(ms_sizes, ms_rng))
                pending.append({k: v for k, v in batch.items()
                                if k not in ("labels", "indices")})  # keep task extras
                if len(pending) >= chunk:
                    flush()
            flush()
            avg = {k: v / max(count, 1) for k, v in running.items()}

            ema_vars = {"params": trainer.state.ema_params, "batch_stats": trainer.state.batch_stats}
            val_metrics = validator(ema_vars, val_loader)
            fitness = val_metrics["fitness"]
            avg.update(epoch=epoch, seconds=time.time() - t0, **{f"val_{k}": v for k, v in val_metrics.items()
                                                                if isinstance(v, (int, float))})
            history.append(avg)
            # per-epoch results.csv (reference trainer save_metrics → results.csv)
            csv_path = run_dir / "results.csv"
            num_keys = [k for k in avg if isinstance(avg[k], (int, float))]
            if not csv_path.is_file():
                csv_path.write_text(",".join(num_keys) + "\n")
            with open(csv_path, "a") as f:
                f.write(",".join(f"{avg.get(k, float('nan')):.6g}" for k in num_keys) + "\n")
            self.callbacks.run("on_train_epoch_end", model=self, epoch=epoch, metrics=avg)
            self.callbacks.run("on_fit_epoch_end", model=self, epoch=epoch, metrics=avg)
            if fitness > best_fitness:
                best_fitness, best_epoch = fitness, epoch
                save_deploy(run_dir / "best.ckpt", ema_vars, model_yaml=self.model.yaml, nc=self.model.nc)
                self.callbacks.run("on_model_save", model=self, path=run_dir / "best.ckpt")
            # persist the FULL effective cfg (not just this call's overrides)
            # so a later resume=True reconstructs imgsz/batch/lr0/epochs even
            # when the original call relied on defaults
            save_checkpoint(run_dir / "last.ckpt", trainer.state, best_fitness=best_fitness,
                            train_args={k: v for k, v in vars(cfg).items() if k != "resume"},
                            metrics=val_metrics, epoch=epoch, best_epoch=best_epoch)
            if cfg.save_period and cfg.save_period > 0 and epoch % cfg.save_period == 0:
                # periodic epoch{N}.ckpt (reference trainer.py:537 save_period)
                save_checkpoint(run_dir / f"epoch{epoch}.ckpt", trainer.state, best_fitness=best_fitness,
                                train_args={k: v for k, v in vars(cfg).items() if k != "resume"},
                                metrics=val_metrics, epoch=epoch, best_epoch=best_epoch)
            if cfg.patience and epoch - best_epoch >= cfg.patience:
                break
        train_loader.close()
        val_loader.close()
        if cfg.plots and history:
            # loss/metric curves (reference plot_metrics → results.png)
            from ..utils.plotting import plot_results

            try:
                plot_results(history, save_path=str(run_dir / "results.png"))
            except Exception:
                pass  # plotting is best-effort (headless matplotlib quirks)
        self.variables = {"params": trainer.state.ema_params, "batch_stats": trainer.state.batch_stats}
        out = {"history": history, "best_fitness": best_fitness, "run_dir": str(run_dir)}
        self.callbacks.run("on_train_end", model=self, metrics=history[-1] if history else {})
        self.callbacks.run("teardown", model=self)
        return out

    # -------------------------------------------------------------------- val
    def val(self, data: Union[str, Path], split: str = "val", batch: int = 16, imgsz: int = 640,
            conf: float = 0.001, iou: float = 0.7, coco_stats: bool = True, **kw) -> Dict:
        imgsz = check_imgsz(imgsz, stride=max(self.model.strides, default=1))
        ds = YOLODataset(data, split=split, imgsz=imgsz, task=self.task)
        loader = DataLoader(ds, batch_size=batch, imgsz=imgsz, augment=False, shuffle=False,
                            drop_last=False, task=self.task)
        if self.task == "detect":
            validator = DetectionValidator(self.model, conf=conf, iou=iou, use_coco_stats=coco_stats,
                                           save_json=bool(kw.get("save_json", False)),
                                           save_dir=kw.get("save_dir"))
        else:
            validator = self._make_validator(conf=conf, iou=iou)
        self.callbacks.run("on_val_start", model=self)
        metrics = validator(self._ensure_variables(imgsz), loader)
        self.callbacks.run("on_val_end", model=self, metrics=metrics)
        loader.close()
        return metrics

    # ---------------------------------------------------------------- predict
    def _make_predictor(self, conf, iou, imgsz, **kw):
        from .predictor import TASK_PREDICTORS, PosePredictor

        # reference predict flags that reach NMS (cfg/default.yaml
        # agnostic_nms/classes; utils/ops.py:167)
        extra = {k: kw[k] for k in ("agnostic_nms", "classes", "device_preprocess", "max_det")
                 if k in kw}
        cls = TASK_PREDICTORS[self.task]
        if cls is PosePredictor:
            return cls(self.model, kpt_shape=tuple(self.model.yaml.get("kpt_shape", (17, 3))),
                       conf=conf, iou=iou, imgsz=imgsz, **extra)
        return cls(self.model, conf=conf, iou=iou, imgsz=imgsz, **extra)

    def predict(self, source, conf: float = 0.25, iou: float = 0.45, imgsz: int = 640, **kw):
        """Task-dispatched prediction returning typed Results (reference
        Model.predict → task_map predictor, engine/model.py:501)."""
        imgsz = check_imgsz(imgsz, stride=max(self.model.strides, default=1))
        predictor = self._make_predictor(conf, iou, imgsz, **kw)
        self.callbacks.run("on_predict_start", model=self)
        results = predictor(self._ensure_variables(imgsz), source)
        self.callbacks.run("on_predict_end", model=self, results=results)
        return results

    __call__ = predict

    # ------------------------------------------------------------------ track
    def track(self, source, tracker: str = "bytetrack.yaml", persist: bool = False,
              conf: float = 0.25, iou: float = 0.45, imgsz: int = 640,
              vid_stride: int = 1, **kw):
        """Stream a video/image-sequence source through predict + a
        multi-object tracker; returns Results with id'd boxes (reference
        Model.track engine/model.py:694 + trackers/track.py).

        persist=True keeps tracker state between calls (the reference's
        frame-by-frame loop idiom)."""
        from ..data.loaders import load_inference_source
        from ..trackers.track import make_tracker, update_result_with_tracks

        if not persist or getattr(self, "_tracker", None) is None:
            self._tracker = make_tracker(tracker)
            self._predictor = self._make_predictor(conf, iou, imgsz, **kw)
        variables = self._ensure_variables(imgsz)
        results = []
        if isinstance(source, np.ndarray):
            frames = [(None, source)]
        elif isinstance(source, (list, tuple)) and len(source) and isinstance(source[0], np.ndarray):
            frames = [(None, f) for f in source]
        else:
            frames = load_inference_source(source, vid_stride=vid_stride)
        for path, frame in frames:
            r = self._predictor(variables, [frame])[0]
            r.path = path if isinstance(path, str) else r.path
            results.append(update_result_with_tracks(r, self._tracker, frame))
        return results

    # ----------------------------------------------------------------- export
    def export(self, format: str = "stablehlo", path: Optional[str] = None,
               imgsz: int = 640, batch: int = 1, nms: bool = False, **kw):
        """Export to a deploy format via the Exporter (reference
        Model.export, engine/model.py:694 export section)."""
        from .exporter import Exporter

        exporter = Exporter(self.model, self._ensure_variables(imgsz), imgsz=imgsz,
                            batch=batch, with_nms=nms)
        self.callbacks.run("on_export_start", model=self, format=format)
        out = exporter(fmt=format, path=path)
        self.callbacks.run("on_export_end", model=self, path=out)
        return out

    # -------------------------------------------------------------- benchmark
    def benchmark(self, data: Union[str, Path, None] = None, imgsz: int = 640,
                  batch: int = 1, formats=("stablehlo", "deploy"), **kw) -> Dict:
        """Export-format × latency (+ optional mAP) matrix (reference
        utils/benchmarks.py:50 benchmark())."""
        import tempfile

        rows = []
        variables = self._ensure_variables(imgsz)
        x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
        fwd = jax.jit(lambda v, im: self.model.predict(v, im))
        jax.block_until_ready(fwd(variables, x))
        t0 = time.time()
        for _ in range(5):
            jax.block_until_ready(fwd(variables, x))
        base_ms = (time.time() - t0) / 5 * 1000
        row = {"format": "jax", "ok": True, "latency_ms": round(base_ms, 2)}
        if data is not None:
            row["metrics"] = self.val(data, imgsz=imgsz, batch=max(batch, 2))
        rows.append(row)
        for fmt in formats:
            try:
                with tempfile.TemporaryDirectory() as td:
                    p = self.export(format=fmt, path=str(Path(td) / f"model.{fmt}"),
                                    imgsz=imgsz, batch=batch)
                    rows.append({"format": fmt, "ok": True, "path_existed": Path(p).exists()})
            except Exception as e:  # noqa: BLE001 - benchmark table reports failures
                rows.append({"format": fmt, "ok": False, "error": str(e)})
        return {"rows": rows}

    # ------------------------------------------------------------------- tune
    def tune(self, data: Union[str, Path], iterations: int = 10, epochs: int = 3,
             space: Optional[Dict] = None, **kw) -> Dict:
        """Mutation-evolution hyperparameter search over short trainings
        (reference Model.tune → Tuner, engine/tuner.py)."""
        from .tuner import Tuner

        def train_fn(hyp: Dict) -> float:
            out = self.train(data, epochs=epochs, **{**kw, **hyp})
            return float(out["best_fitness"])

        tuner = Tuner(train_fn, space=space)
        best_hyp, best_fitness = tuner(iterations=iterations)
        return {"best_hyp": best_hyp, "best_fitness": best_fitness}
