"""Train state, optimizer construction and schedules.

TPU-native equivalent of the reference's BaseTrainer optimizer machinery
(engine/trainer.py:759 build_optimizer, :364-377 warmup, :586 grad-clip 10.0)
and ModelEMA (utils/torch_utils.py:496). One optax chain replaces the three
torch param groups: weight decay is masked to conv/dense kernels only (the
reference's g[1]); BN scales and biases train without decay.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_updates: jnp.ndarray


def decay_mask(params) -> Any:
    """True for parameters that receive weight decay: conv/dense kernels.

    Mirrors the reference's param grouping (trainer.py:759): weights with
    decay vs BN weights / biases without.
    """

    def rule(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        if any(k == "bn" for k in keys):
            return False
        return keys[-1] in ("kernel",)

    return jax.tree_util.tree_map_with_path(rule, params)


def freeze_mask(params, freeze) -> Optional[Any]:
    """Pytree of bools, True = parameter receives NO updates.

    Reference semantics (engine/trainer.py:246-260): `freeze=N` freezes the
    first N layers (`model.0.` … `model.N-1.`), `freeze=[…]` freezes listed
    layer indices or name fragments. Here layer i's params live under the
    top-level key `m{i}`, so int entries match that key exactly and string
    entries substring-match the flattened path (like the reference's
    `any(x in k …)`). The reference's always-frozen `.dfl` has no analogue:
    DFL is folded analytically into decode here (ops/boxes.py) and owns no
    parameters. Returns None when nothing is frozen.
    """
    if freeze in (None, 0, False) or (isinstance(freeze, (list, tuple)) and not freeze):
        return None
    items = list(freeze) if isinstance(freeze, (list, tuple)) else list(range(int(freeze)))
    idx_keys = set()
    fragments = []
    for x in items:
        if isinstance(x, bool):
            raise ValueError(f"freeze entries must be layer indices or names, got {x}")
        if isinstance(x, int) or (isinstance(x, str) and x.isdigit()):
            idx_keys.add(f"m{int(x)}")
        else:
            fragments.append(str(x))

    def rule(path, leaf):
        keys = [str(p.key) for p in path if hasattr(p, "key")]
        if keys and keys[0] in idx_keys:
            return True
        joined = "/".join(keys)
        return any(f in joined for f in fragments)

    return jax.tree_util.tree_map_with_path(rule, params)


def _freeze_updates(mask) -> optax.GradientTransformation:
    """Zero the update for every frozen leaf (mask True). Zeroing the final
    update (rather than the gradient) also kills weight decay on frozen
    params, matching torch requires_grad=False where decay never applies."""

    def update_fn(updates, state, params=None):
        out = jax.tree_util.tree_map(
            lambda u, m: jnp.zeros_like(u) if m else u, updates, mask
        )
        return out, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def auto_optimizer(nc: int, lr0: float, momentum: float, iterations: float) -> Tuple[str, float, float]:
    """'auto' optimizer heuristic (reference trainer.py:766-781)."""
    if iterations > 10000:
        return "SGD", 0.01, 0.9
    lr_fit = round(0.002 * 5 / (4 + nc), 6)
    return "AdamW", lr_fit, 0.9


def make_lr_schedule(
    lr0: float,
    lrf: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: float = 3.0,
    cos_lr: bool = False,
) -> Callable:
    """Per-step LR: linear warmup → cosine or linear epoch decay.

    Matches the reference's one_cycle/linear lf (trainer.py:310-317) composed
    with per-iteration warmup interp (trainer.py:364-377, bias-group warmup
    offset not modeled — biases warm from 0 like other params).
    """
    warmup_steps = max(round(warmup_epochs * steps_per_epoch), 100)

    def lf(epoch):
        if cos_lr:
            return ((1 - jnp.cos(epoch * jnp.pi / epochs)) / 2) * (lrf - 1) + 1
        return (1 - epoch / epochs) * (1.0 - lrf) + lrf

    def schedule(step):
        epoch = step / steps_per_epoch
        base = lr0 * lf(jnp.minimum(epoch, epochs))
        warm = base * jnp.clip(step / warmup_steps, 0.0, 1.0)
        return jnp.where(step < warmup_steps, warm, base)

    return schedule


def build_optimizer(
    params,
    nc: int,
    cfg,
    steps_per_epoch: int,
) -> Tuple[optax.GradientTransformation, Callable]:
    """Create the optax chain: clip(10) → coupled weight decay → momentum → lr."""
    name = cfg.optimizer
    lr0, momentum = cfg.lr0, cfg.momentum
    if name == "auto":
        iterations = steps_per_epoch * cfg.epochs
        name, lr0, momentum = auto_optimizer(nc, lr0, momentum, iterations)

    # reference scales decay by batch*accumulate/nbs (trainer.py:252-255)
    accumulate = max(round(cfg.nbs / cfg.batch), 1)
    weight_decay = cfg.weight_decay * cfg.batch * accumulate / cfg.nbs

    schedule = make_lr_schedule(
        lr0, cfg.lrf, cfg.epochs, steps_per_epoch, cfg.warmup_epochs, cfg.cos_lr
    )
    mask = decay_mask(params)
    if name in ("SGD",):
        tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.add_decayed_weights(weight_decay, mask=lambda p: decay_mask(p)),
            optax.trace(decay=momentum, nesterov=True),
            optax.scale_by_learning_rate(schedule),
        )
    elif name in ("AdamW", "Adam", "NAdam", "RAdam"):
        tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.scale_by_adam(b1=momentum, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(weight_decay, mask=lambda p: decay_mask(p)),
            optax.scale_by_learning_rate(schedule),
        )
    elif name == "RMSProp":
        tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.scale_by_rms(),
            optax.add_decayed_weights(weight_decay, mask=lambda p: decay_mask(p)),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        raise ValueError(f"unknown optimizer '{name}'")
    # Skip updates whose gradients contain inf/NaN, like the reference's AMP
    # GradScaler (trainer.py:586 scaler.unscale_+step: non-finite grads skip
    # the optimizer step and only shrink the scale). Degenerate batches (e.g.
    # constant images → zero BN variance → rsqrt(eps)-amplified backward
    # overflow) then cost one skipped step instead of permanently NaN params.
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    fmask = freeze_mask(params, getattr(cfg, "freeze", None))
    if fmask is not None:
        # reference freeze (trainer.py:246-260): first-N / named layers get
        # requires_grad=False; here the optax chain zeroes their updates so
        # the params stay bitwise identical through training
        tx = optax.chain(tx, _freeze_updates(fmask))
    if getattr(cfg, "grad_accumulate", False) and accumulate > 1:
        # reference nbs=64 gradient accumulation (trainer.py:369): micro-batch
        # gradients accumulate and the optimizer steps every `accumulate`
        # calls. Off by default on TPU — the mesh usually absorbs the batch.
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx, schedule


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # distinct buffers, not an alias of params: with buffer donation on,
        # an aliased pytree makes the first dispatch donate the same buffer
        # twice (PJRT INVALID_ARGUMENT)
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_updates=jnp.zeros((), jnp.float32),
    )


def ema_update(ema_params, new_params, updates, decay=0.9999, tau=2000.0):
    """Ramped EMA: d = decay * (1 - exp(-updates / tau)) (torch_utils.py:496)."""
    d = decay * (1.0 - jnp.exp(-updates / tau))
    return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema_params, new_params)
