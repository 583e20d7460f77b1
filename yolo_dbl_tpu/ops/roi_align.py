"""RoIAlign on NHWC feature maps — pure-JAX gather formulation.

TPU-native replacement for torchvision's C++/CUDA RoIAlign used by the
reference's Fast-RCNN (models/Fast-RCNN/model.py:13 RoIAlign aligned=True,
model.py:51 MultiScaleRoIAlign). Matches torchvision semantics:

  * `aligned=True` shifts box coordinates by -0.5 (pixel-center alignment);
  * `sampling_ratio=n` samples n×n points per output bin (n = ceil(bin size)
    when -1/0) and averages them;
  * bilinear interpolation with zero outside the feature map.

Fixed shapes: rois is (K, 5) [batch_idx, x1, y1, x2, y2]; K is static, pad
with zero-rois and mask downstream. The whole thing lowers to batched
gathers + mean reductions — XLA fuses it; a Pallas variant can take over if
profiling shows the gather is hot (SURVEY.md §2.11 north-star item).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(
    features,
    rois,
    output_size=(7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = -1,
    aligned: bool = True,
):
    """Args:
        features: (B, H, W, C).
        rois: (K, 5) [batch_idx, x1, y1, x2, y2] in input-image coordinates.
        output_size: (oh, ow) pooled size.
        spatial_scale: feature/input scale (e.g. 1/32).
        sampling_ratio: samples per bin side; <=0 → adaptive (ceil of bin size,
            but static shapes require a fixed value — we use 2, torchvision's
            common configuration; exact adaptive matching needs per-roi shapes).
        aligned: half-pixel alignment.

    Returns:
        (K, oh, ow, C) pooled features.
    """
    oh, ow = output_size
    b, h, w, c = features.shape
    sr = sampling_ratio if sampling_ratio > 0 else 2

    offset = 0.5 if aligned else 0.0
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_h = roi_h / oh  # (K,)
    bin_w = roi_w / ow

    # sample grid: for output bin (i, j), samples at
    # y1 + (i + (s + 0.5)/sr) * bin_h  for s in [0, sr)
    iy = (jnp.arange(oh)[:, None] + (jnp.arange(sr)[None, :] + 0.5) / sr).reshape(-1)  # (oh*sr,)
    ix = (jnp.arange(ow)[:, None] + (jnp.arange(sr)[None, :] + 0.5) / sr).reshape(-1)  # (ow*sr,)
    sy = y1[:, None] + iy[None, :] * bin_h[:, None]  # (K, oh*sr)
    sx = x1[:, None] + ix[None, :] * bin_w[:, None]  # (K, ow*sr)

    def bilinear(feat, ys, xs):
        """feat (H, W, C); ys (P,), xs (Q,) → (P, Q, C) with zero padding
        outside [-1, H) like torchvision (sample < -1 or > H → 0)."""
        valid_y = (ys >= -1.0) & (ys <= h)
        valid_x = (xs >= -1.0) & (xs <= w)
        ys = jnp.clip(ys, 0.0, h - 1)
        xs = jnp.clip(xs, 0.0, w - 1)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = ys - y0
        wx = xs - x0
        f00 = feat[y0][:, x0]  # (P, Q, C)
        f01 = feat[y0][:, x1i]
        f10 = feat[y1i][:, x0]
        f11 = feat[y1i][:, x1i]
        top = f00 * (1 - wx)[None, :, None] + f01 * wx[None, :, None]
        bot = f10 * (1 - wx)[None, :, None] + f11 * wx[None, :, None]
        out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
        mask = (valid_y[:, None] & valid_x[None, :])[..., None]
        return jnp.where(mask, out, 0.0)

    def one_roi(bi, ys, xs):
        feat = features[bi]  # dynamic gather over batch
        samples = bilinear(feat, ys, xs)  # (oh*sr, ow*sr, C)
        samples = samples.reshape(oh, sr, ow, sr, c)
        return samples.mean(axis=(1, 3))

    return jax.vmap(one_roi)(batch_idx, sy, sx)


def multiscale_roi_align(
    feature_list,
    rois,
    image_size: int,
    output_size=(7, 7),
    sampling_ratio: int = 2,
    canonical_scale: int = 224,
    canonical_level: int = 4,
):
    """FPN level assignment + per-level RoIAlign (torchvision
    MultiScaleRoIAlign / FPN paper eq.1, used at reference Fast-RCNN
    model.py:51). feature_list: [(B, H_l, W_l, C)] for levels P2..P5.

    Fixed-shape strategy: pool every roi at every level, then select the
    assigned level's result — 4x the gathers but no dynamic partitioning
    (cheap next to the backbone; a Pallas kernel can specialize later).
    """
    k_min = 2
    scales = [2 ** -(k_min + i) for i in range(len(feature_list))]
    areas = (rois[:, 3] - rois[:, 1]) * (rois[:, 4] - rois[:, 2])
    s = jnp.sqrt(jnp.maximum(areas, 1e-6))
    target = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    target = jnp.clip(target, k_min, k_min + len(feature_list) - 1).astype(jnp.int32) - k_min

    pooled = jnp.stack(
        [
            roi_align(f, rois, output_size, spatial_scale=sc, sampling_ratio=sampling_ratio, aligned=False)
            for f, sc in zip(feature_list, scales)
        ],
        axis=0,
    )  # (L, K, oh, ow, C)
    return jnp.take_along_axis(pooled, target[None, :, None, None, None], axis=0)[0]
