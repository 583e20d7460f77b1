"""Adaptive pooling helpers shared by the attention pool (NHWC).

Implements torch's AdaptiveAvgPool2d semantics (bin edges floor(i*I/O) ..
ceil((i+1)*I/O)) with static shapes via integral images — fully vectorized,
no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def adaptive_avg_pool2d(x, out_hw):
    """NHWC adaptive average pool to (oh, ow), matching torch bin edges."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if oh == h and ow == w:
        return x
    if oh == 1 and ow == 1:
        return x.mean(axis=(1, 2), keepdims=True)

    # integral image with zero row/col prefix
    ii = jnp.cumsum(jnp.cumsum(x, axis=1), axis=2)
    ii = jnp.pad(ii, ((0, 0), (1, 0), (1, 0), (0, 0)))

    hs = np.floor(np.arange(oh) * h / oh).astype(np.int32)
    he = np.ceil((np.arange(oh) + 1) * h / oh).astype(np.int32)
    ws = np.floor(np.arange(ow) * w / ow).astype(np.int32)
    we = np.ceil((np.arange(ow) + 1) * w / ow).astype(np.int32)

    a = ii[:, he][:, :, we]       # (B, oh, ow, C)
    bq = ii[:, he][:, :, ws]
    cq = ii[:, hs][:, :, we]
    d = ii[:, hs][:, :, ws]
    sums = a - bq - cq + d
    areas = ((he - hs)[:, None] * (we - ws)[None, :]).astype(x.dtype)
    return sums / areas[None, :, :, None]


def adaptive_avg_pool_h(x):
    """AdaptiveAvgPool2d((None, 1)): mean over W → (B, H, 1, C)."""
    return x.mean(axis=2, keepdims=True)


def adaptive_avg_pool_w(x):
    """AdaptiveAvgPool2d((1, None)): mean over H → (B, 1, W, C)."""
    return x.mean(axis=1, keepdims=True)
