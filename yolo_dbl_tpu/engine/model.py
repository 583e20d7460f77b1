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
from ..utils.checkpoint import load_deploy, save_checkpoint, save_deploy
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
        cfg = get_cfg(overrides={k: v for k, v in overrides.items()})
        names = overrides.get("names")
        task = self.task
        train_ds = YOLODataset(data, split="train", imgsz=cfg.imgsz, task=task)
        try:
            val_ds = YOLODataset(data, split="val", imgsz=cfg.imgsz, task=task)
        except FileNotFoundError:
            val_ds = train_ds
        hyp = {k: getattr(cfg, k) for k in
               ("mosaic", "mixup", "degrees", "translate", "scale", "shear", "perspective",
                "hsv_h", "hsv_s", "hsv_v", "fliplr", "flipud")}
        train_loader = DataLoader(train_ds, batch_size=cfg.batch, imgsz=cfg.imgsz, augment=True,
                                  hyp=hyp, seed=cfg.seed, task=task)
        val_loader = DataLoader(val_ds, batch_size=cfg.batch, imgsz=cfg.imgsz, augment=False,
                                shuffle=False, drop_last=False, task=task)

        trainer = Trainer(self.model, overrides=dict(overrides), mesh=mesh)
        trainer.setup(steps_per_epoch=max(len(train_loader), 1))
        self.trainer = trainer
        validator = self._make_validator()

        run_dir = Path(cfg.project or "runs") / (cfg.name or "train")
        run_dir.mkdir(parents=True, exist_ok=True)
        best_fitness, best_epoch = -1.0, -1
        history = []
        rng = jax.random.PRNGKey(cfg.seed)
        for epoch in range(cfg.epochs):
            if cfg.close_mosaic and epoch == cfg.epochs - cfg.close_mosaic:
                train_loader.close_mosaic()
            t0 = time.time()
            running, count = {}, 0
            if cfg.multi_scale:
                from ..data.rect import multi_scale_sizes, resize_batch, sample_scale

                ms_sizes = multi_scale_sizes(cfg.imgsz, max(self.model.strides))
                ms_rng = np.random.default_rng(cfg.seed + epoch)
            for batch in train_loader:
                if cfg.multi_scale:
                    batch = dict(batch)
                    batch["img"] = resize_batch(batch["img"], sample_scale(ms_sizes, ms_rng))
                metrics = trainer.step(
                    {k: v for k, v in batch.items()
                     if k not in ("labels", "indices")}, rng)  # keep task extras (gt_masks/gt_kpts)
                count += 1
                for k, v in metrics.items():
                    running[k] = running.get(k, 0.0) + float(v)
            avg = {k: v / max(count, 1) for k, v in running.items()}

            ema_vars = {"params": trainer.state.ema_params, "batch_stats": trainer.state.batch_stats}
            val_metrics = validator(ema_vars, val_loader)
            fitness = val_metrics["fitness"]
            avg.update(epoch=epoch, seconds=time.time() - t0, **{f"val_{k}": v for k, v in val_metrics.items()
                                                                if isinstance(v, (int, float))})
            history.append(avg)
            save_checkpoint(run_dir / "last.ckpt", trainer.state, best_fitness=max(fitness, best_fitness),
                            train_args=dict(overrides), metrics=val_metrics)
            if fitness > best_fitness:
                best_fitness, best_epoch = fitness, epoch
                save_deploy(run_dir / "best.ckpt", ema_vars, model_yaml=self.model.yaml, nc=self.model.nc)
            if cfg.patience and epoch - best_epoch >= cfg.patience:
                break
        self.variables = {"params": trainer.state.ema_params, "batch_stats": trainer.state.batch_stats}
        return {"history": history, "best_fitness": best_fitness, "run_dir": str(run_dir)}

    # -------------------------------------------------------------------- val
    def val(self, data: Union[str, Path], split: str = "val", batch: int = 16, imgsz: int = 640,
            conf: float = 0.001, iou: float = 0.7, coco_stats: bool = True, **kw) -> Dict:
        ds = YOLODataset(data, split=split, imgsz=imgsz, task=self.task)
        loader = DataLoader(ds, batch_size=batch, imgsz=imgsz, augment=False, shuffle=False,
                            drop_last=False, task=self.task)
        if self.task == "detect":
            validator = DetectionValidator(self.model, conf=conf, iou=iou, use_coco_stats=coco_stats)
        else:
            validator = self._make_validator(conf=conf, iou=iou)
        return validator(self._ensure_variables(imgsz), loader)

    # ---------------------------------------------------------------- predict
    def predict(self, source, conf: float = 0.25, iou: float = 0.45, imgsz: int = 640, **kw):
        predictor = DetectionPredictor(self.model, conf=conf, iou=iou, imgsz=imgsz)
        return predictor(self._ensure_variables(imgsz), source)

    __call__ = predict
