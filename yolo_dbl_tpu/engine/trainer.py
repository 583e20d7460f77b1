"""Training engine: jitted SPMD train step + epoch loop.

TPU-native equivalent of the reference's BaseTrainer (engine/trainer.py:58).
The torch version re-execs itself under torch.distributed.run with one
process per GPU (utils/dist.py:56) and wraps the model in DDP; here the
whole train step is ONE jit-compiled SPMD program over a `jax.sharding.Mesh`
— the batch is sharded on the 'data' axis, parameters are replicated, and
XLA inserts the gradient all-reduce (the DDP bucket all-reduce) plus
cross-replica BatchNorm statistics automatically because normalization sees
the global batch.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cfg import get_cfg
from ..losses.detection import detection_loss
from ..nn.tasks import DetectionModel
from .train_state import TrainState, build_optimizer, create_train_state, ema_update


def _task_loss(model: DetectionModel, cfg, outputs, batch):
    """Dispatch the loss on the model's head family (reference v8DetectionLoss
    / v8SegmentationLoss / v8PoseLoss / v8OBBLoss / E2EDetectLoss selection in
    BaseModel.init_criterion)."""
    strides, nc = model.strides, model.nc
    gains = dict(box_gain=cfg.box, cls_gain=cfg.cls, dfl_gain=cfg.dfl)
    head = getattr(model, "head_name", "Detect")
    if head == "Segment":
        from ..losses.extra import segmentation_loss
        det, coeffs, protos = outputs
        return segmentation_loss(det, coeffs, protos, batch, strides, nc,
                                 overlap_masks=bool(getattr(cfg, "overlap_mask", True)), **gains)
    if head == "Pose":
        from ..losses.extra import pose_loss
        det, kpts = outputs
        kpt_shape = tuple(model.yaml.get("kpt_shape", (17, 3)))
        return pose_loss(det, kpts, batch, strides, nc, kpt_shape=kpt_shape,
                         pose_gain=cfg.pose, kobj_gain=cfg.kobj, **gains)
    if head == "OBB":
        from ..losses.extra import obb_loss
        det, angles = outputs
        return obb_loss(det, angles, batch, strides, nc, **gains)
    if head == "RTDETRDecoder":
        from ..losses.detr import rtdetr_loss
        return rtdetr_loss(outputs, batch, nc)
    if isinstance(outputs, dict):  # v10Detect end-to-end
        from ..losses.extra import e2e_detect_loss
        total, items = e2e_detect_loss(outputs, batch, strides, nc, **gains)
        return total, items["one2many"]
    return detection_loss(outputs, batch, strides, nc, **gains)


def make_train_step(model: DetectionModel, cfg, tx, remat_loss: bool = False) -> Callable:
    """Build the jitted train step closure over static model/config.

    remat_loss: wrap the loss in jax.checkpoint so its backward recomputes
    the ~12 ms loss forward instead of reading saved (B, A=8400, 64) f32
    residuals back from HBM — a traffic-for-flops trade on a step the
    roofline (PROFILE.md) shows is bandwidth-bound at 78% of peak with
    14.6% MFU. A/B'd on the real chip by tools/exp_loss_remat.py.
    """
    if remat_loss:
        task_loss = jax.checkpoint(lambda outs, b: _task_loss(model, cfg, outs, b))
    else:
        task_loss = lambda outs, b: _task_loss(model, cfg, outs, b)

    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            from ..kernels.preprocess import device_normalize

            outputs, mutated = model.module.apply(
                {"params": params, "batch_stats": state.batch_stats},
                device_normalize(batch["img"]),  # uint8 batches /255 on device
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss, items = task_loss(outputs, batch)
            return loss, (items, mutated["batch_stats"])

        (loss, (items, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_ema = ema_update(state.ema_params, new_params, state.ema_updates + 1.0)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
            ema_updates=state.ema_updates + 1.0,
        )
        d = items if isinstance(items, dict) else items._asdict()
        metrics = {"loss": loss, **{f"{k}_loss": v for k, v in d.items()}}
        return new_state, metrics

    return train_step


def make_train_scan(step: Callable) -> Callable:
    """K train steps in ONE dispatch: lax.scan over a stacked batch pytree.

    Round-3 finding (tools/exp_train_scan.py): the fused step computes in
    ~200 ms at b16@640 bf16, but dispatching it per batch costs ~2.1 s —
    the TrainState pytree is ~1k buffer handles marshalled over the runtime
    per call. Scanning K steps amortizes that to 1/K. rng is folded by
    state.step inside the step, so every scan iteration keeps its own
    deterministic stream (resume-exact, like the per-step path).
    """

    def train_scan(state: TrainState, stacked: Dict, rng):
        from ..kernels.preprocess import device_normalize

        # normalize the whole (K, B, H, W, 3) block in ONE op before the
        # scan: uint8 arrays carried through lax.scan are pathologically slow
        # on the axon runtime (9.9 s/step vs 122 ms with float inputs,
        # tools/exp_train_scan.py 2026-08-17 — per-iteration u8 slicing);
        # device_normalize inside the step then passes floats through.
        stacked = {**stacked, "img": device_normalize(stacked["img"])}

        def body(st, b):
            st, metrics = step(st, b, rng)
            return st, metrics

        return jax.lax.scan(body, state, stacked)

    return train_scan


class Trainer:
    """Single-program trainer: model + cfg → state, jitted step, epoch loop.

    Reference behaviors carried over (engine/trainer.py): warmup + cosine or
    linear LR, grad clip 10.0, EMA with decay ramp, fitness-based best
    checkpointing, close_mosaic epoch switch (delegated to the dataloader),
    patience-based early stopping.
    """

    def __init__(self, model: DetectionModel, overrides: Optional[Dict] = None, mesh: Optional[Mesh] = None,
                 scan_steps: int = 8):
        self.model = model
        self.cfg = get_cfg(overrides=overrides or {})
        self.mesh = mesh
        self.state: Optional[TrainState] = None
        self.tx = None
        self._step_fn = None
        self._scan_fn = None
        # batches per device dispatch (see make_train_scan); 1 disables
        self.scan_steps = max(1, int(scan_steps))

    def setup(self, steps_per_epoch: int, rng=None, imgsz: Optional[int] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        variables = self.model.init(rng, imgsz=imgsz or self.cfg.imgsz)
        self.tx, self.lr_schedule = build_optimizer(
            variables["params"], self.model.nc, self.cfg, steps_per_epoch
        )
        self.state = create_train_state(variables, self.tx)
        step = make_train_step(self.model, self.cfg, self.tx)
        # Buffer donation of the TrainState halves peak HBM, but the axon TPU
        # plugin miscompiles donated train steps once the GT pad dimension is
        # >=16 (runtime INVALID_ARGUMENT; bisected 2026-08-16: identical step
        # passes without donation). Donate everywhere else. Re-test on plugin
        # upgrades with YOLO_DBL_FORCE_DONATE=1 (runs one donated step; if it
        # trains cleanly the gate below can be dropped). Last re-test
        # 2026-08-17: still reproduces (INVALID_ARGUMENT at first step).
        import os as _os

        plat_ver = getattr(jax.devices()[0].client, "platform_version", "")
        gate_axon = "axon" in plat_ver.lower() and not _os.environ.get("YOLO_DBL_FORCE_DONATE")
        donate = () if gate_axon else (0,)
        scan = make_train_scan(step)
        if self.mesh is not None:
            data_sharding = NamedSharding(self.mesh, P("data"))
            stacked_sharding = NamedSharding(self.mesh, P(None, "data"))
            repl = NamedSharding(self.mesh, P())
            from ..parallel.shardings import model_axis_size, model_parallel_shardings

            if model_axis_size(self.mesh) > 1:
                # DP x TP: large kernels shard their out-channel dim over
                # the 'model' axis (parallel/shardings.py); state arg uses
                # in_shardings=None so the committed placement sticks and
                # GSPMD inserts the gathers
                st_sh = model_parallel_shardings(self.state, self.mesh)
                self.state = jax.tree_util.tree_map(jax.device_put, self.state, st_sh)
            else:
                st_sh = repl
                self.state = jax.device_put(self.state, repl)
            # pytree-prefix: every batch leaf (incl. task extras like
            # gt_masks / gt_kpts) shards on the data axis. out_shardings pins
            # the OUTPUT state to the input placement: left unspecified,
            # GSPMD re-shards some replicated 1-D leaves at the step boundary
            # (found by tests/test_flagship_multichip_compile.py at b48@640
            # 4x2), which drifts the committed placement and forces one
            # recompile on the second step of every run.
            self._step_fn = jax.jit(
                step,
                in_shardings=(None, data_sharding, repl),
                out_shardings=(st_sh, repl),
                donate_argnums=donate,
            )
            self._scan_fn = jax.jit(
                scan,
                in_shardings=(None, stacked_sharding, repl),
                out_shardings=(st_sh, repl),
                donate_argnums=donate,
            )
        else:
            self._step_fn = jax.jit(step, donate_argnums=donate)
            self._scan_fn = jax.jit(scan, donate_argnums=donate)
        return self

    def restore(self, path) -> Dict:
        """Restore {params, opt_state, EMA, step, batch_stats} from a
        last.ckpt (reference resume_training, engine/trainer.py:724). Must be
        called after setup(); re-applies the mesh placement so a resumed
        multi-chip run keeps its shardings."""
        from ..utils.checkpoint import load_checkpoint

        state, meta = load_checkpoint(path, self.state)
        if self.mesh is not None:
            from ..parallel.shardings import model_axis_size, model_parallel_shardings

            if model_axis_size(self.mesh) > 1:
                st_sh = model_parallel_shardings(state, self.mesh)
                state = jax.tree_util.tree_map(jax.device_put, state, st_sh)
            else:
                state = jax.device_put(state, NamedSharding(self.mesh, P()))
        self.state = state
        return meta

    def shard_batch(self, batch: Dict) -> Dict:
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        ds = NamedSharding(self.mesh, P("data"))
        return {k: jax.device_put(jnp.asarray(v), ds) for k, v in batch.items()}

    def step(self, batch: Dict, rng) -> Dict:
        self.state, metrics = self._step_fn(self.state, self.shard_batch(batch), rng)
        return metrics

    def step_many(self, batches, rng) -> Dict:
        """Run len(batches) train steps in ONE device dispatch (scan).

        ~10x faster than per-step dispatch on remote runtimes (see
        make_train_scan). All batches must share shapes. Returns metrics
        stacked along axis 0 (one row per step)."""
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(None, "data"))
            stacked = {k: jax.device_put(jnp.asarray(v), sh) for k, v in stacked.items()}
        self.state, metrics = self._scan_fn(self.state, stacked, rng)
        return metrics

    def fit(self, train_iter: Iterable, epochs: Optional[int] = None, steps_per_epoch: Optional[int] = None,
            on_epoch_end: Optional[Callable] = None, log_every: int = 50):
        """Epoch loop over an iterator yielding batch dicts."""
        epochs = epochs or self.cfg.epochs
        rng = jax.random.PRNGKey(self.cfg.seed)
        history = []
        for epoch in range(epochs):
            t0 = time.time()
            running: Dict[str, float] = {}
            count = 0
            pending = []
            inflight = []  # (metric pytree, n_steps) not yet host-fetched

            def drain(keep: int = 0):
                # fetch completed dispatches' metrics; keeping one in flight
                # overlaps host staging of the next super-batch with device
                # compute (jax dispatch is async; float() is the sync point)
                nonlocal count
                while len(inflight) > keep:
                    ms, n = inflight.pop(0)
                    for k, v in ms.items():
                        running[k] = running.get(k, 0.0) + float(np.asarray(v).sum())
                    count += n

            def flush():
                if not pending:
                    return
                n = len(pending)
                if n == self.scan_steps and self.scan_steps > 1:
                    inflight.append((self.step_many(pending, rng), n))
                else:
                    # odd-sized tail: per-step path (a different scan length
                    # would cost a full extra compilation)
                    for b in pending:
                        inflight.append((self.step(b, rng), 1))
                pending.clear()
                drain(keep=1)

            for i, batch in enumerate(train_iter):
                if steps_per_epoch is not None and i >= steps_per_epoch:
                    break
                pending.append(batch)
                if len(pending) >= self.scan_steps:
                    flush()
            flush()
            drain(keep=0)
            avg = {k: v / max(count, 1) for k, v in running.items()}
            avg.update(epoch=epoch, seconds=time.time() - t0)
            history.append(avg)
            if on_epoch_end is not None:
                if on_epoch_end(self, epoch, avg) is False:
                    break
        return history
