"""Feature-map extraction and visualization.

Equivalent of the reference's global_utils/features.py (extract_data:12 via
forward hooks + joblib cache, plot_feature_map:79, find_plot_size:58). Torch
forward hooks become flax `capture_intermediates` — every module's output is
recorded in one traced pass instead of registering per-layer hooks.
"""

from __future__ import annotations

import math
import pickle
from pathlib import Path
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


def extract_features(model, variables, x, layer_indices: Optional[List[int]] = None,
                     cache_path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Run the model capturing per-layer outputs (reference features.py:12).

    model: DetectionModel; layer_indices: spec layer numbers to keep
    (None = all). Results cached with pickle like the reference's joblib use.
    """
    if cache_path and Path(cache_path).exists():
        with open(cache_path, "rb") as f:
            return pickle.load(f)
    _, state = model.module.apply(
        variables, x, train=False, capture_intermediates=True, mutable=["intermediates"]
    )
    inter = state["intermediates"]
    out: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            elif k == "__call__":
                val = v[0]
                leaves = val if isinstance(val, (list, tuple)) else [val]
                for i, leaf in enumerate(leaves):
                    if hasattr(leaf, "shape"):
                        out[f"{prefix}[{i}]" if len(leaves) > 1 else prefix] = np.asarray(leaf)

    walk(inter)
    if layer_indices is not None:
        keep = {f"m{i}" for i in layer_indices}
        out = {k: v for k, v in out.items() if k.split("/")[0] in keep}
    if cache_path:
        with open(cache_path, "wb") as f:
            pickle.dump(out, f)
    return out


def find_plot_size(n: int):
    """Grid shape solver (reference features.py:58): near-square rows×cols ≥ n."""
    rows = int(math.sqrt(n))
    while rows > 1 and n % rows:
        rows -= 1
    if rows == 1:
        rows = int(math.sqrt(n))
        cols = math.ceil(n / rows)
    else:
        cols = n // rows
    return rows, cols


def plot_feature_map(feat: np.ndarray, max_channels: int = 64, save_path: Optional[str] = None):
    """Channel-grid plot of one NHWC feature map (reference features.py:79)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fm = feat[0] if feat.ndim == 4 else feat  # (H, W, C)
    c = min(fm.shape[-1], max_channels)
    rows, cols = find_plot_size(c)
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.6, rows * 1.6))
    axes = np.atleast_1d(axes).ravel()
    for i in range(rows * cols):
        axes[i].axis("off")
        if i < c:
            axes[i].imshow(fm[..., i], cmap="viridis")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
    return fig
