"""Checkpoint save/load with best/last/fitness semantics.

Equivalent of the reference's BaseTrainer.save_model (engine/trainer.py:513):
a single serialized blob {step, best_fitness, params, ema_params,
batch_stats, opt_state, train_args, metrics} written to last/best. Orbax is
available in-image but a msgpack flax serialization keeps checkpoints
single-file and dependency-light like the reference's .pt files;
strip_optimizer (torch_utils.py:534) maps to save_deploy().
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state, best_fitness: float = 0.0, train_args: Optional[Dict] = None,
                    metrics: Optional[Dict] = None, epoch: int = -1, best_epoch: int = -1):
    """Serialize full training state (resume-capable)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = {
        "step": int(state.step),
        "ema_updates": float(state.ema_updates),
        "best_fitness": float(best_fitness),
        "epoch": int(epoch),
        "best_epoch": int(best_epoch),
        "params": serialization.to_bytes(_to_host(state.params)),
        "ema_params": serialization.to_bytes(_to_host(state.ema_params)),
        "batch_stats": serialization.to_bytes(_to_host(state.batch_stats)),
        "opt_state": pickle.dumps(_to_host(state.opt_state)),
        "train_args": train_args or {},
        "metrics": metrics or {},
        "version": 1,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def peek_checkpoint_meta(path) -> Dict:
    """Read resume metadata {epoch, best_fitness, train_args, metrics} without
    needing a TrainState template — used to re-apply checkpointed train args
    BEFORE datasets/loaders/optimizer are built (reference check_resume,
    engine/trainer.py:692)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return {"best_fitness": blob["best_fitness"], "train_args": blob.get("train_args") or {},
            "metrics": blob.get("metrics") or {}, "epoch": blob.get("epoch", -1),
            "best_epoch": blob.get("best_epoch", -1)}


def load_checkpoint(path, state):
    """Restore into an existing TrainState template; returns (state, meta)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    params = serialization.from_bytes(_to_host(state.params), blob["params"])
    ema = serialization.from_bytes(_to_host(state.ema_params), blob["ema_params"])
    stats = serialization.from_bytes(_to_host(state.batch_stats), blob["batch_stats"])
    opt_state = pickle.loads(blob["opt_state"])
    import jax.numpy as jnp

    new_state = state.replace(
        step=jnp.asarray(blob["step"], jnp.int32),
        ema_updates=jnp.asarray(blob["ema_updates"], jnp.float32),
        params=params,
        ema_params=ema,
        batch_stats=stats,
        opt_state=jax.tree_util.tree_map(
            lambda t, s: jnp.asarray(s) if hasattr(t, "dtype") else s, state.opt_state, opt_state
        ),
    )
    meta = {"best_fitness": blob["best_fitness"], "train_args": blob["train_args"],
            "metrics": blob["metrics"], "epoch": blob.get("epoch", -1),
            "best_epoch": blob.get("best_epoch", -1)}
    return new_state, meta


def save_deploy(path, variables: Dict[str, Any], model_yaml: Optional[Dict] = None, nc: Optional[int] = None):
    """Deploy checkpoint: EMA/inference params only (reference strip_optimizer)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = {
        "variables": serialization.to_bytes(_to_host(variables)),
        "model_yaml": model_yaml or {},
        "nc": nc,
        "version": 1,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_deploy(path, variables_template):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return serialization.from_bytes(_to_host(variables_template), blob["variables"]), blob
