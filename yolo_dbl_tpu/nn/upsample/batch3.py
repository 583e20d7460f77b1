"""Upsample pool, batch 3 (NHWC, flax.linen).

Reference parity (nn/modules_upsample/):
  * M2C2f (YOLO_EMAC.py:319): R-ELAN over MBlocks — DyT dynamic-tanh norm
    (:155), parallel multi-window MHSA (3/5/7) fused by 1×1 (:258), MLP;
  * C3k2_EAMC (YOLO_EMAC.py:393): C2f with triple-feature ECA gate (:359);
  * CARAFEplusplus (CARAFEplusplus.py:6): unified content-aware up/down
    reassembly;
  * LDA_AQU (LDA_AQU.py:31): local deformable attention query upsampling —
    hi-res queries attend over k_u² deformably-offset samples of the lo-res
    key/value map.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import avg_pool2, bilinear_upsample, nearest_upsample, pixel_shuffle
from ..common import Conv, Conv2d
from .carafe import _unfold_patches

Dtype = Any


class DyT(nn.Module):
    """Dynamic tanh 'norm' (reference YOLO_EMAC.py:155)."""

    channels: int
    init_alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(self.init_alpha), (1,))
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        y = jnp.tanh(alpha.astype(x.dtype) * x)
        return gamma.astype(x.dtype) * y + beta.astype(x.dtype)


class WindowMHSA(nn.Module):
    """Pad-to-window MHSA (reference YOLO_EMAC.py:180)."""

    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ws = self.window_size
        ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(xp)
        wins = qkv.reshape(b, hp // ws, ws, wp // ws, ws, 3 * c).transpose(0, 1, 3, 2, 4, 5)
        wins = wins.reshape(-1, ws * ws, 3, self.num_heads, hd)
        q, k, v = wins[:, :, 0], wins[:, :, 1], wins[:, :, 2]
        attn = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k), axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(-1, ws, ws, c)
        out = out.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        out = nn.Dense(c, use_bias=False, dtype=self.dtype, name="proj")(out)
        return out[:, :h, :w]


class MBlock(nn.Module):
    """DyT → multi-window attention → DyT → MLP, residual (reference :276)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    window_sizes: Tuple[int, ...] = (3, 5, 7)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = DyT(self.dim, dtype=self.dtype, name="dyt1")(x)
        outs = [
            WindowMHSA(self.dim, self.num_heads, ws, dtype=self.dtype, name=f"win{ws}")(y, train)
            for ws in self.window_sizes
        ]
        fused = Conv2d(self.dim, 1, bias=False, dtype=self.dtype, name="fuse")(jnp.concatenate(outs, -1))
        x = x + fused
        y = DyT(self.dim, dtype=self.dtype, name="dyt2")(x)
        z = nn.gelu(Conv2d(int(self.dim * self.mlp_ratio), 1, dtype=self.dtype, name="mlp1")(y))
        z = Conv2d(self.dim, 1, dtype=self.dtype, name="mlp2")(z)
        return x + z


class M2C2f(nn.Module):
    """R-ELAN over MBlocks (reference YOLO_EMAC.py:319)."""

    c2: int
    n: int = 1
    use_attn: bool = True
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..blocks import C3k

        c_ = int(self.c2 * self.e)
        num_heads = max(1, c_ // 32)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for i in range(self.n):
            if self.use_attn:
                z = ys[-1]
                for j in range(2):
                    z = MBlock(c_, num_heads, self.mlp_ratio, dtype=self.dtype, name=f"m_{i}_{j}")(z, train)
                ys.append(z)
            else:
                ys.append(C3k(c_, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)
        if self.use_attn and self.residual:
            gamma = self.param("gamma", nn.initializers.constant(0.01), (self.c2,))
            return x + gamma.astype(out.dtype) * out
        return out


class C3k2_EAMC(nn.Module):
    """C2f + triple-feature ECA gate (reference YOLO_EMAC.py:393,359)."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    eca_k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..blocks import Bottleneck, C3k

        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            blk = (
                C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
                if self.c3k
                else Bottleneck(c, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
            )
            ys.append(blk(ys[-1], train))
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)
        # triple-feature ECA
        b, _, _, c2 = out.shape
        avg = out.mean(axis=(1, 2))
        mx = out.max(axis=(1, 2))
        proj = Conv2d(c2, 1, dtype=self.dtype, name="channel_proj")(out).mean(axis=(1, 2))
        yv = jnp.stack([avg, mx, proj], axis=-1)  # (B, C, 3)
        gate = nn.Conv(1, (self.eca_k,), padding=[((self.eca_k - 1) // 2,) * 2], use_bias=False,
                       dtype=self.dtype, name="reduce_conv")(yv)[..., 0]
        return out * nn.sigmoid(gate)[:, None, None, :]


class CARAFEplusplus(nn.Module):
    """CARAFE++ unified up/down reassembly (reference CARAFEplusplus.py:6)."""

    in_channels: int
    scale_factor: int = 2
    up_down_type: str = "up"
    k_encoder: int = 3
    k_reassembly: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, ku = self.scale_factor, self.k_reassembly
        comp = Conv2d(max(c // 4, 16), 1, dtype=self.dtype, name="comp")(x)
        if self.up_down_type == "up":
            wgt = Conv2d(s * s * ku * ku, self.k_encoder, p=self.k_encoder // 2,
                         dtype=self.dtype, name="enc")(comp)
            wgt = pixel_shuffle(wgt, s)  # (B, sH, sW, ku²)
            wgt = jax.nn.softmax(wgt, axis=-1)
            xu = nearest_upsample(x, s)
            patches = _unfold_patches(xu, ku, dilation=s)
            return jnp.einsum("bhwck,bhwk->bhwc", patches, wgt)
        # down: predict kernels at lo-res, reassemble strided patches
        comp_d = avg_pool2(comp) if s == 2 else comp[:, ::s, ::s]
        wgt = Conv2d(ku * ku, self.k_encoder, p=self.k_encoder // 2, dtype=self.dtype, name="enc")(comp_d)
        wgt = jax.nn.softmax(wgt, axis=-1)
        patches = _unfold_patches(x, ku, dilation=1)[:, ::s, ::s]
        return jnp.einsum("bhwck,bhwk->bhwc", patches, wgt)


class LDA_AQU(nn.Module):
    """Local deformable attention query upsampler (reference LDA_AQU.py:31).

    Hi-res queries (bilinear-upsampled q projection) attend over k_u²
    deformably-offset bilinear samples of the lo-res key map; attention
    re-assembles the raw lo-res values.
    """

    in_channels: int
    reduction_factor: int = 4
    nh: int = 1
    scale_factor: float = 2.0
    k_u: int = 3
    n_groups: int = 2
    range_factor: float = 11.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.resample import sample_bilinear_pixel

        b, h, w, c = x.shape
        s = int(self.scale_factor)
        hq, wq = h * s, w * s
        hidden = c // self.reduction_factor
        hd = hidden // self.nh
        ku2 = self.k_u**2

        q = Conv2d(hidden, 1, bias=False, dtype=self.dtype, name="proj_q")(x)
        k = Conv2d(hidden, 1, bias=False, dtype=self.dtype, name="proj_k")(x)
        q_hi = bilinear_upsample(q, s, align_corners=False)  # (B, Hq, Wq, hidden)

        # per-group offsets from the hi-res queries
        gc = hidden // self.n_groups
        qg = q_hi.reshape(b, hq, wq, self.n_groups, gc).transpose(0, 3, 1, 2, 4).reshape(
            b * self.n_groups, hq, wq, gc
        )
        off = Conv2d(gc, 3, p=1, g=gc, bias=False, dtype=self.dtype, name="off_dw")(qg)
        off = nn.gelu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="off_ln")(off))
        off = Conv2d(2 * ku2, 3, p=1, dtype=self.dtype, name="off_pw")(off)  # (BG, Hq, Wq, 2ku²)
        off = jnp.tanh(off) * (self.range_factor / max(h, w))
        off = off.reshape(b * self.n_groups, hq, wq, ku2, 2)

        # base sampling: parent lo-res position + k_u×k_u neighborhood
        base_y = (jnp.arange(hq) + 0.5) / s - 0.5
        base_x = (jnp.arange(wq) + 0.5) / s - 0.5
        dy = (jnp.arange(self.k_u) - self.k_u // 2).astype(jnp.float32)
        gy = base_y[:, None, None] + jnp.repeat(dy, self.k_u)[None, None, :]
        gx = base_x[None, :, None] + jnp.tile(dy, self.k_u)[None, None, :]
        sy = gy[None] + off[..., 0] * h
        sx = gx[None] + off[..., 1] * w

        kg = k.reshape(b, h, w, self.n_groups, gc).transpose(0, 3, 1, 2, 4).reshape(
            b * self.n_groups, h, w, gc
        )
        vg = x.reshape(b, h, w, self.n_groups, c // self.n_groups).transpose(0, 3, 1, 2, 4).reshape(
            b * self.n_groups, h, w, c // self.n_groups
        )
        k_s = sample_bilinear_pixel(kg, sy, sx)  # (BG, Hq, Wq, ku², gc)
        v_s = sample_bilinear_pixel(vg, sy, sx)  # (BG, Hq, Wq, ku², c/g)

        qh = qg  # queries per group (BG, Hq, Wq, gc)
        attn = jnp.einsum("bhwc,bhwkc->bhwk", qh * (hd**-0.5), k_s)
        if True:  # relative position bias (rpb=True default)
            rpb = self.param("rpb", nn.initializers.zeros, (ku2,))
            attn = attn + rpb.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhwk,bhwkc->bhwc", attn, v_s)  # (BG, Hq, Wq, c/g)
        out = out.reshape(b, self.n_groups, hq, wq, c // self.n_groups)
        return out.transpose(0, 2, 3, 1, 4).reshape(b, hq, wq, c)
