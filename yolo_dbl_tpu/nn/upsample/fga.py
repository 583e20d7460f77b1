"""FGA — Fourier-Guided Attention upsampler (NHWC, flax).

Reference parity: modules_upsample/FGA/{fga_arch.py:250 FGA, :175 CAL,
:43 OWXRA, subpixmlp.py:9 GetFourierFeatures, :102 SubPixelMLP,
arch_util.py:178 MLP}. Pipeline: 3×3 embed → SubPixelMLP (conv + Fourier
feature modulation + pixel-shuffle per ×2 stage) produces the HR draft →
CAL cross-attends HR window queries against overlapping LR windows (OWXRA,
with relative position bias) → residual MLP → 3×3 unembed.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.resample import nearest_upsample, pixel_shuffle, pixel_unshuffle

Dtype = Any


class _MLP1x1(nn.Module):
    """conv1x1 → ReLU → conv1x1 (FGA arch_util.py:178, num_layer=0)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(x))
        return nn.Conv(self.out, (1, 1), dtype=self.dtype, name="fc2")(x)


def _make_coord(h, w):
    """Grid-center coordinates in [0, 1], (h, w, 2) yx (subpixmlp.py:28)."""
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / w
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gy, gx], -1).astype(np.float32)


class GetFourierFeatures(nn.Module):
    """Sub-pixel Fourier feature modulation (subpixmlp.py:9): channels pair up
    with the per-subpixel coordinate residuals, producing cos/sin features
    that gate the input before a 1×1 MLP."""

    dim: int
    scale: int
    depth: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        s = self.scale
        # coordinate residuals: target grid centers minus nearest-upsampled
        # source centers, scaled by (h, w) (subpixmlp.py:43)
        up = _make_coord(h * s, w * s)  # (Hs, Ws, 2) yx
        base = np.repeat(np.repeat(_make_coord(h, w), s, axis=0), s, axis=1)
        res = up - base
        res[..., 0] *= h
        res[..., 1] *= w
        coord = pixel_unshuffle(jnp.asarray(res)[None], s)  # (1, h, w, 2*s²), c-major
        coord = coord.reshape(1, h, w, 2, s * s).swapaxes(-1, -2)  # (1, h, w, s², 2)

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = y.reshape(b, h, w, c // (2 * s * s), s * s, 2)
        y = (y * coord[:, :, :, None]).sum(-1)  # (b, h, w, c/(2s²), s²)
        y = y.reshape(b, h, w, c // 2)
        y = jnp.concatenate([jnp.cos(2 * jnp.pi * y), jnp.sin(2 * jnp.pi * y)], -1)
        return _MLP1x1(self.dim, self.dim, dtype=self.dtype, name="mlp")(y * shortcut)


class SubPixelMLP(nn.Module):
    """Fourier-enhanced pixel-shuffle upsampling (subpixmlp.py:102)."""

    dim: int
    scale: int = 2
    depth: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.scale
        if s == 3:
            steps, step = 1, 3
        elif s & (s - 1) == 0:
            steps, step = int(np.log2(s)), 2
        else:
            raise ValueError(f"scale {s} unsupported (2^n or 3)")
        for i in range(steps):
            x = nn.Conv(self.dim * step * step, (3, 3), dtype=self.dtype, name=f"conv{i}")(x)
            x = GetFourierFeatures(self.dim * step * step, step, self.depth,
                                   dtype=self.dtype, name=f"ff{i}")(x)
            x = pixel_shuffle(x, step)
        return x


def _rpi_owxra(ws_up: int, ws_cur: int) -> np.ndarray:
    """Relative position index between HR-window and overlapping-LR-window
    tokens (fga_arch.py:90 calculate_rpi_owxra); negative entries wrap into
    the bias table exactly like torch indexing."""
    cu = np.stack(np.meshgrid(np.arange(ws_up), np.arange(ws_up), indexing="ij")).reshape(2, -1)
    cc = np.stack(np.meshgrid(np.arange(ws_cur), np.arange(ws_cur), indexing="ij")).reshape(2, -1)
    rel = cc[:, None, :] - cu[:, :, None]  # (2, up², cur²)
    rel = np.transpose(rel, (1, 2, 0)).copy()
    rel += ws_up - ws_cur + 1
    rel[..., 0] *= ws_up + ws_cur - 1
    return rel.sum(-1)  # (up², cur²), may contain negatives (wrap)


class OWXRA(nn.Module):
    """Overlapping-window cross-resolution attention (fga_arch.py:43):
    HR window tokens query overlapping LR key/value windows."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int = 1
    upscale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, q_windows):
        """x: (B, h, w, C) low-res; q_windows: (B·nw, ws_up², C)."""
        b, h, w, c = x.shape
        ws = self.window_size
        ow = int(ws * self.overlap_ratio) + ws
        ws_up = self.upscale * ws
        nh = self.num_heads
        d = c // nh

        kv = nn.Dense(2 * c, dtype=self.dtype, name="kv")(x)  # (B, h, w, 2C)
        # overlapping unfold: ow×ow patches at stride ws
        p = (ow - ws) // 2
        kvp = jnp.pad(kv, ((0, 0), (p, p), (p, p), (0, 0)))
        iy = jnp.arange(h // ws) * ws
        ix = jnp.arange(w // ws) * ws
        patches = []
        for dy in range(ow):
            for dx in range(ow):
                patches.append(kvp[:, dy + iy][:, :, dx + ix])
        # (B, nh_w, nw_w, ow², 2C) token order = row-major over the window
        kvw = jnp.stack(patches, axis=3)
        nwin = (h // ws) * (w // ws)
        kvw = kvw.reshape(b * nwin, ow * ow, 2, c)
        k, v = kvw[..., 0, :], kvw[..., 1, :]

        q = q_windows.reshape(-1, ws_up * ws_up, nh, d).swapaxes(1, 2)
        k = k.reshape(-1, ow * ow, nh, d).swapaxes(1, 2)
        v = v.reshape(-1, ow * ow, nh, d).swapaxes(1, 2)
        attn = (q * (d ** -0.5)) @ k.swapaxes(-1, -2)  # (nwb, nh, up², ow²)

        table = self.param("rpb_table", nn.initializers.normal(0.02),
                           ((ws_up + ow - 1) ** 2, nh))
        idx = jnp.asarray(_rpi_owxra(ws_up, ow))
        bias = jnp.transpose(table[idx], (2, 0, 1))  # (nh, up², ow²)
        attn = jax.nn.softmax(attn + bias[None], axis=-1)
        out = (attn @ v).swapaxes(1, 2).reshape(-1, ws_up * ws_up, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class CAL(nn.Module):
    """Correlation attention layer (fga_arch.py:175): window-partitioned HR
    draft + OWXRA against LR, residual, then a residual 1×1 MLP."""

    dim: int
    upscale: int
    window_size: int = 1
    overlap_ratio: float = 4.0
    num_heads: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2):
        b, hh, wh, c = x2.shape
        wu = self.upscale * self.window_size
        # window partition (fga_arch.py:11): (B·nw, wu², C)
        xw = x2.reshape(b, hh // wu, wu, wh // wu, wu, c)
        xw = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(-1, wu * wu, c)
        attn = OWXRA(self.dim, self.window_size, self.overlap_ratio,
                     self.num_heads, self.upscale, dtype=self.dtype, name="attn")(x, xw)
        xw = xw + attn
        y = xw.reshape(b, hh // wu, wh // wu, wu, wu, c)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, hh, wh, c)
        return y + _MLP1x1(self.dim, self.dim, dtype=self.dtype, name="mlp")(y)


class FGA(nn.Module):
    """Fourier-Guided Attention upsampler (fga_arch.py:250)."""

    dim: int = 64
    back_embed_dim: Optional[int] = None
    out_dim: Optional[int] = None
    upscale: int = 2
    window_size: int = 1
    overlap_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="embed")(x)
        y = nn.leaky_relu(y, 0.01)
        hr = SubPixelMLP(self.dim, self.upscale, dtype=self.dtype, name="upsample")(y)
        y = CAL(self.dim, self.upscale, self.window_size, self.overlap_ratio,
                dtype=self.dtype, name="coattn")(y, hr)
        if self.out_dim is not None:
            y = nn.Conv(self.out_dim, (3, 3), dtype=self.dtype, name="unembed")(y)
        return y
