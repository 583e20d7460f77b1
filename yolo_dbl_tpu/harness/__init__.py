"""Shared classical-detector harness (reference global_utils/ equivalent)."""

from .analyze import get_prf1, plt_coco_stats, read_coco_stats, replot_conf_matrix
from .features import extract_features, find_plot_size, plot_feature_map
from .tools import WindowsRouser, find_new_dir, numeric_sort, time_sync
from .trainer import EarlyStopping, Trainer, default_detect, default_val

__all__ = [
    "get_prf1",
    "plt_coco_stats",
    "read_coco_stats",
    "replot_conf_matrix",
    "extract_features",
    "find_plot_size",
    "plot_feature_map",
    "WindowsRouser",
    "find_new_dir",
    "numeric_sort",
    "time_sync",
    "EarlyStopping",
    "Trainer",
    "default_detect",
    "default_val",
]
