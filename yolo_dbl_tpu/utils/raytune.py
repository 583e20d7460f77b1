"""Ray Tune integration (reference utils/tuner.py run_ray_tune).

Same entry point and default ASHA search space as the reference. Ray is an
optional dependency (absent in a zero-egress build): when unavailable, the
call transparently falls back to the in-repo mutation Tuner
(engine/tuner.py) over the same space, sampling uniformly from each range —
the API contract (best hyp dict + metrics) is identical either way.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

# Reference default space (utils/tuner.py:34-56)
DEFAULT_SPACE: Dict[str, tuple] = {
    "lr0": (1e-5, 1e-1),
    "lrf": (0.01, 1.0),
    "momentum": (0.6, 0.98),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "warmup_momentum": (0.0, 0.95),
    "box": (0.02, 0.2),
    "cls": (0.2, 4.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "degrees": (0.0, 45.0),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.9),
    "shear": (0.0, 10.0),
    "perspective": (0.0, 0.001),
    "flipud": (0.0, 1.0),
    "fliplr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "mixup": (0.0, 1.0),
    "copy_paste": (0.0, 1.0),
}


def run_ray_tune(
    train_fn: Callable[[Dict], float],
    space: Optional[Dict] = None,
    grace_period: int = 10,
    max_samples: int = 10,
    epochs: int = 30,
    **tune_kwargs,
) -> Dict:
    """Hyperparameter search via Ray Tune ASHA when ray is installed,
    mutation evolution otherwise.

    train_fn(hyp_dict) -> fitness (higher better), matching the reference's
    tune-wrapped _tune trainable (utils/tuner.py:58-77).
    """
    space = dict(space or DEFAULT_SPACE)
    try:
        import ray  # noqa: F401
        from ray import tune
        from ray.tune.schedulers import ASHAScheduler
    except ImportError:
        from ..engine.tuner import Tuner

        # engine Tuner space entries are (lo, hi, gain) triples
        mut_space = {k: (v if len(v) == 3 else (*v, 1.0)) for k, v in space.items()}
        tuner = Tuner(train_fn, space=mut_space)
        best_hyp, best_fitness = tuner(iterations=max_samples)
        return {"best_hyp": best_hyp, "best_fitness": best_fitness, "backend": "mutation"}

    tune_space = {k: tune.uniform(*v) for k, v in space.items()}

    def trainable(config):
        fitness = train_fn(dict(config))
        tune.report({"fitness": fitness})

    scheduler = ASHAScheduler(
        time_attr="epoch", metric="fitness", mode="max",
        max_t=epochs, grace_period=grace_period, reduction_factor=3)
    results = tune.Tuner(
        trainable,
        param_space=tune_space,
        tune_config=tune.TuneConfig(scheduler=scheduler, num_samples=max_samples),
        **tune_kwargs,
    ).fit()
    best = results.get_best_result(metric="fitness", mode="max")
    return {"best_hyp": dict(best.config), "best_fitness": best.metrics["fitness"],
            "backend": "ray"}
