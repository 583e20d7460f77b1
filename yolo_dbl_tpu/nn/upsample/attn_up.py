"""Attention-based feature upsamplers: AnyUp and JAFAR (NHWC, flax).

Reference parity: modules_upsample/AnyUp/{model.py:12 AnyUp, :82 AnyUpPack,
layers/*} and modules_upsample/JAFAR/{jafar.py:10, layers.py}. Both upsample
low-res features to an arbitrary output size by cross-attending high-res
image-derived queries against low-res keys, then applying the (head-averaged)
attention to the RAW feature values — torch's MultiheadAttention value/out
projections are computed and discarded there, so they are omitted here.

Differences from torch kept intentionally:
  * q-chunking (a torch memory knob) is dropped — XLA tiles the attention.
  * the attention window mask (AnyUp attention_masking.py) is built with
    numpy at trace time from the static shapes.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..attention.pooling import adaptive_avg_pool2d

Dtype = Any


def rope_init_freqs(dim: int, theta: float = 100.0) -> np.ndarray:
    """2-D RoPE angular frequencies (AnyUp positional_encoding.py:21)."""
    f1 = theta ** np.linspace(0, -1, dim // 4)
    f1 = np.concatenate([f1, f1])
    f2 = np.zeros((2, dim), np.float32)
    f2[0, : dim // 2] = f1
    f2[1, dim // 2:] = f1
    return f2 * 2 * np.pi


def _rotate_half(x):
    c = x.shape[-1] // 2
    return jnp.concatenate([-x[..., c:], x[..., :c]], axis=-1)


class RoPE(nn.Module):
    """Learnable 2-D rotary embedding (AnyUp/JAFAR RoPE)."""

    dim: int
    theta: float = 100.0

    @nn.compact
    def __call__(self, x, coords):
        freqs = self.param("freqs", lambda k: jnp.asarray(rope_init_freqs(self.dim, self.theta)))
        angle = coords @ freqs  # (1, N, C)
        return x * jnp.cos(angle) + _rotate_half(x) * jnp.sin(angle)


def _reflect_conv(x, features, k, name, dtype):
    """k×k reflect-padded conv, no bias (torch padding_mode='reflect')."""
    if k > 1:
        p = k // 2
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return nn.Conv(features, (k, k), padding="VALID", use_bias=False, dtype=dtype, name=name)(x)


class ResBlock(nn.Module):
    """magvit-style residual block (JAFAR layers.py:54): GN→SiLU→conv ×2."""

    c2: int
    k: int = 1
    num_groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = x
        y = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype, name="norm1")(x)
        y = _reflect_conv(nn.silu(y), self.c2, self.k, "conv1", self.dtype)
        y = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype, name="norm2")(y)
        y = _reflect_conv(nn.silu(y), self.c2, self.k, "conv2", self.dtype)
        if r.shape[-1] != self.c2:
            r = nn.Conv(self.c2, (1, 1), use_bias=False, dtype=self.dtype, name="shortcut")(r)
        return y + r


class _Encoder(nn.Module):
    """conv (reflect) + 2 ResBlocks (AnyUp model.py:45 _make_encoder)."""

    qk_dim: int
    k: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _reflect_conv(x, self.qk_dim, self.k, "pre", self.dtype)
        x = ResBlock(self.qk_dim, 1, dtype=self.dtype, name="rb0")(x)
        return ResBlock(self.qk_dim, 1, dtype=self.dtype, name="rb1")(x)


class LearnedFeatureUnification(nn.Module):
    """Channel-count-agnostic feature encoder (AnyUp feature_unification.py:37):
    every input channel is filtered by a learned k×k basis bank,
    count-normalized at borders, softmaxed over the bank, averaged over input
    channels."""

    out_channels: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        basis = self.param("basis", nn.initializers.normal(1.0), (self.out_channels, self.k, self.k))
        # depthwise: group-major feature order (c*out + o), like torch groups=c
        hwio = jnp.tile(jnp.transpose(basis, (1, 2, 0))[:, :, None, :], (1, 1, 1, c))
        p = self.k // 2
        y = jax.lax.conv_general_dilated(
            x, hwio.astype(x.dtype), (1, 1), [(p, p), (p, p)], feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ones = jnp.ones((1, h, w, 1), x.dtype)
        denom = jax.lax.conv_general_dilated(
            ones, jnp.ones((self.k, self.k, 1, 1), x.dtype), (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y / denom
        # torch reinterprets the flat (c*out) buffer as [out][c]; same reshape
        y = y.reshape(b, h, w, self.out_channels, c)
        return jax.nn.softmax(y, axis=-2).mean(-1)  # (B, H, W, out)


def window_attention_bias(hq, wq, hk, wk, ratio: float) -> jnp.ndarray:
    """(Q, L) additive bias: 0 inside each query's low-res window, -inf
    outside (AnyUp attention_masking.py:7,44). Static-shape numpy build."""
    rp = (np.arange(hq) + 0.5) / hq
    cp = (np.arange(wq) + 0.5) / wq
    r0 = np.floor(np.clip(rp - ratio, 0, 1) * hk).astype(int)
    r1 = np.ceil(np.clip(rp + ratio, 0, 1) * hk).astype(int)
    c0 = np.floor(np.clip(cp - ratio, 0, 1) * wk).astype(int)
    c1 = np.ceil(np.clip(cp + ratio, 0, 1) * wk).astype(int)
    rows = np.arange(hk)
    cols = np.arange(wk)
    row_ok = (rows[None] >= r0[:, None]) & (rows[None] < r1[:, None])  # (hq, hk)
    col_ok = (cols[None] >= c0[:, None]) & (cols[None] < c1[:, None])  # (wq, wk)
    ok = (row_ok[:, None, :, None] & col_ok[None, :, None, :]).reshape(hq * wq, hk * wk)
    return jnp.asarray(np.where(ok, 0.0, -np.inf), jnp.float32)


class _AttnWeights(nn.Module):
    """RMSNorm q/k → multi-head scores → head-averaged softmax weights
    (AnyUp chunked_attention.py CrossAttention; value/out projections of
    torch MultiheadAttention are discarded upstream and omitted here)."""

    qk_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, bias=None):
        hd = self.qk_dim // self.num_heads
        q = nn.RMSNorm(dtype=self.dtype, name="norm_q")(q)
        k = nn.RMSNorm(dtype=self.dtype, name="norm_k")(k)
        qp = nn.Dense(self.qk_dim, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.qk_dim, dtype=self.dtype, name="k_proj")(k)
        b, nq, _ = qp.shape
        nk = kp.shape[1]
        qp = qp.reshape(b, nq, self.num_heads, hd)
        kp = kp.reshape(b, nk, self.num_heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / jnp.sqrt(hd).astype(qp.dtype)
        if bias is not None:
            scores = scores + bias[None, None]
        return jax.nn.softmax(scores, axis=-1).mean(axis=1)  # (B, Q, K)


class AnyUp(nn.Module):
    """Universal feature upsampler (reference AnyUp/model.py:12).

    __call__(image (B,H,W,input_dim), feats (B,h,w,C), output_size=(H',W'))
    → (B, H', W', C). Queries come from the RoPE-encoded image at output
    resolution, keys fuse image and LFU-encoded features at feature
    resolution, and the head-averaged attention reassembles raw features.
    """

    input_dim: int = 3
    qk_dim: int = 128
    kernel_size: int = 1
    kernel_size_lfu: int = 5
    window_ratio: float = 0.1
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, feats, output_size: Optional[Tuple[int, int]] = None):
        out_hw = tuple(output_size) if output_size is not None else image.shape[1:3]
        b, h, w, c = feats.shape

        enc = _Encoder(self.qk_dim, self.kernel_size, dtype=self.dtype, name="image_encoder")(image)
        he, we = enc.shape[1:3]
        gy = jnp.linspace(0.0, 1.0, he)
        gx = jnp.linspace(0.0, 1.0, we)
        coords = jnp.stack(jnp.meshgrid(gy, gx, indexing="ij"), -1).reshape(1, he * we, 2)
        enc = RoPE(self.qk_dim, name="rope")(enc.reshape(b, he * we, self.qk_dim), coords)
        enc = enc.reshape(b, he, we, self.qk_dim)

        q = _Encoder(self.qk_dim, 1, dtype=self.dtype, name="query_encoder")(enc)
        q = adaptive_avg_pool2d(q, out_hw)
        k = _Encoder(self.qk_dim, 1, dtype=self.dtype, name="key_encoder")(enc)
        k = adaptive_avg_pool2d(k, (h, w))
        fn = feats / jnp.clip(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        kf = LearnedFeatureUnification(self.qk_dim, self.kernel_size_lfu,
                                       dtype=self.dtype, name="key_features_encoder_lfu")(fn)
        kf = ResBlock(self.qk_dim, 1, dtype=self.dtype, name="key_features_rb0")(kf)
        kf = ResBlock(self.qk_dim, 1, dtype=self.dtype, name="key_features_rb1")(kf)
        k = _Encoder(self.qk_dim, 3, dtype=self.dtype, name="aggregation")(
            jnp.concatenate([k, kf], -1))

        # cross-attention block: 3x3 conv on q, windowed scores, raw-v mix
        q = nn.Conv(self.qk_dim, (3, 3), use_bias=False, dtype=self.dtype, name="q_conv")(q)
        bias = (window_attention_bias(*out_hw, h, w, self.window_ratio)
                if self.window_ratio > 0 else None)
        attn = _AttnWeights(self.qk_dim, self.num_heads, dtype=self.dtype, name="cross")(
            q.reshape(b, -1, self.qk_dim), k.reshape(b, -1, self.qk_dim), bias)
        out = jnp.einsum("bqk,bkc->bqc", attn, feats.reshape(b, -1, c))
        return out.reshape(b, *out_hw, c)


class AnyUpPack(nn.Module):
    """YOLO-embeddable AnyUp (reference AnyUp/model.py:82): image = the
    feature map itself; default output size = the input size."""

    in_channels: int
    qk_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, feats=None, output_size=None, train: bool = False):
        feats = image if feats is None else feats
        return AnyUp(self.in_channels, self.qk_dim, dtype=self.dtype, name="anyup")(
            image, feats, output_size or feats.shape[1:3])


class SFTModulation(nn.Module):
    """Spatial feature transform (JAFAR layers.py:110): γ(feat)·GN(img)+β(feat)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, features):
        g = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="gamma")(features)
        bta = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="beta")(features)
        x = nn.GroupNorm(num_groups=8, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="norm")(image)
        return g * x + bta


class JAFAR(nn.Module):
    """JAFAR upsampler (reference JAFAR/jafar.py:10): like AnyUp but keys are
    SFT-modulated by encoded features and there is no attention window."""

    input_dim: int = 3
    qk_dim: int = 128
    v_dim: int = 384
    kernel_size: int = 1
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, feats, output_size: Tuple[int, int]):
        b, h, w, c = feats.shape
        enc = _Encoder(self.qk_dim, self.kernel_size, dtype=self.dtype, name="image_encoder")(image)
        he, we = enc.shape[1:3]
        gy = jnp.linspace(0.0, 1.0, he)
        gx = jnp.linspace(0.0, 1.0, we)
        coords = jnp.stack(jnp.meshgrid(gy, gx, indexing="ij"), -1).reshape(1, he * we, 2)
        enc = RoPE(self.qk_dim, name="rope")(enc.reshape(b, he * we, self.qk_dim), coords)
        enc = enc.reshape(b, he, we, self.qk_dim)

        q = _Encoder(self.qk_dim, 1, dtype=self.dtype, name="query_encoder")(enc)
        q = adaptive_avg_pool2d(q, tuple(output_size))
        q = nn.GroupNorm(num_groups=8, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="q_norm")(q)

        k = _Encoder(self.qk_dim, 1, dtype=self.dtype, name="key_encoder")(enc)
        k = adaptive_avg_pool2d(k, (h, w))
        fn = feats / jnp.clip(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        kf = _Encoder(self.qk_dim, 1, dtype=self.dtype, name="key_features_encoder")(fn)
        k = SFTModulation(self.qk_dim, dtype=self.dtype, name="sft_key")(k, kf)

        q = nn.Conv(self.qk_dim, (3, 3), use_bias=False, dtype=self.dtype, name="q_conv")(q)
        attn = _AttnWeights(self.qk_dim, self.num_heads, dtype=self.dtype, name="cross")(
            q.reshape(b, -1, self.qk_dim), k.reshape(b, -1, self.qk_dim))
        out = jnp.einsum("bqk,bkc->bqc", attn, feats.reshape(b, -1, c))
        return out.reshape(b, output_size[0], output_size[1], c)
