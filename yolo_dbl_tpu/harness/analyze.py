"""Results analysis: coco_stats.csv curves, best-F1 P/R extraction, confusion
matrix replot.

Equivalent of the reference's global_utils/analyze.py (plt_coco_stats:62,
get_coco_PRF1:80, replot_conf_matrix:162). The PRF1 extraction here works
from the framework's own DetMetrics/COCOEvaluator outputs rather than a
pickled pycocotools COCOeval (absent in this image).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


def read_coco_stats(csv_path) -> pd.DataFrame:
    """Load a run's coco_stats.csv (reference analyze.py parse)."""
    return pd.read_csv(csv_path)


def plt_coco_stats(csv_path, save_path: Optional[str] = None):
    """AP/AR/F1 curves over epochs (reference analyze.py:62)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = read_coco_stats(csv_path)
    ap, ar = df["AP"].to_numpy(), df["AR100"].to_numpy()
    f1 = 2 * ap * ar / np.maximum(ap + ar, 1e-9)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(ap, label="AP (mAP50-95)")
    ax.plot(df["AP50"].to_numpy(), label="AP50")
    ax.plot(ar, label="AR@100")
    ax.plot(f1, label="F1(AP, AR)")
    ax.set_xlabel("epoch")
    ax.legend()
    ax.grid(alpha=0.3)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def get_prf1(tp: np.ndarray, conf: np.ndarray, pred_cls: np.ndarray, target_cls: np.ndarray) -> Dict:
    """Per-class best-F1 precision/recall/threshold (reference analyze.py:80
    get_coco_PRF1 — extracted from our ap_per_class machinery instead of a
    pickled COCOeval precision matrix)."""
    from ..utils.metrics import ap_per_class

    res = ap_per_class(tp, conf, pred_cls, target_cls)
    out = {}
    x = np.linspace(0, 1, 1000)
    for i, c in enumerate(res["classes"]):
        out[int(c)] = {
            "precision": float(res["precision"][i]),
            "recall": float(res["recall"][i]),
            "f1": float(res["f1"][i]),
        }
    return out


def replot_conf_matrix(matrix: np.ndarray, names: Optional[List[str]] = None,
                       normalize: bool = True, save_path: Optional[str] = None):
    """Confusion-matrix heatmap (reference analyze.py:162, seaborn → matplotlib)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = matrix.astype(np.float64)
    if normalize:
        m = m / np.maximum(m.sum(axis=0, keepdims=True), 1e-9)
    n = m.shape[0]
    labels = (names or [str(i) for i in range(n - 1)]) + ["background"]
    fig, ax = plt.subplots(figsize=(1.2 * n, 1.0 * n))
    im = ax.imshow(m, cmap="Blues")
    for i in range(n):
        for j in range(n):
            ax.text(j, i, f"{m[i, j]:.2f}", ha="center", va="center",
                    color="white" if m[i, j] > 0.5 else "black", fontsize=8)
    ax.set_xticks(range(n), labels, rotation=45, ha="right")
    ax.set_yticks(range(n), labels)
    ax.set_xlabel("true")
    ax.set_ylabel("predicted")
    fig.colorbar(im, fraction=0.046)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig
