"""YOLO-World open-vocabulary modules (NHWC, flax).

Reference parity: MaxSigmoidAttnBlock (nn/modules/block.py:421), C2fAttn
(block.py:456), ImagePoolingAttn (block.py:483), ContrastiveHead /
BNContrastiveHead (block.py:529,547), WorldDetect (nn/modules/head.py:457)
and the WorldModel text-guided execution loop (nn/tasks.py:640-684).

Text embeddings are passed in as an array (B or 1, K, ct); the reference
computes them with CLIP — in this zero-egress build, `WorldModel.set_classes`
accepts precomputed embeddings (or keeps the random-normal buffer the
reference also initializes with).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv, Conv2d, DWConv

Dtype = Any


def adaptive_max_pool2d(x, out_hw: Tuple[int, int]):
    """Torch AdaptiveMaxPool2d bin semantics on NHWC."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(x[:, h0:h1, w0:w1].max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


class MaxSigmoidAttnBlock(nn.Module):
    """Max-sigmoid text-guided attention (reference block.py:421)."""

    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        b, h, w, c1 = x.shape
        hc = self.c2 // self.nh
        g = nn.Dense(self.ec, dtype=self.dtype, name="gl")(guide)  # (B, K, ec)
        g = g.reshape(b, -1, self.nh, hc)
        embed = Conv(self.ec, 1, act=False, dtype=self.dtype, name="ec_conv")(x, train) if c1 != self.ec else x
        embed = embed.reshape(b, h, w, self.nh, hc)
        aw = jnp.einsum("bhwmc,bkmc->bmhwk", embed, g).max(-1)  # (B, nh, H, W)
        aw = aw / (hc**0.5) + self.param("bias", nn.initializers.zeros, (self.nh,))[None, :, None, None]
        aw = jax.nn.sigmoid(aw)
        if self.scale:
            aw = aw * self.param("scale_p", nn.initializers.ones, (1, self.nh, 1, 1))
        y = Conv(self.c2, 3, 1, act=False, dtype=self.dtype, name="proj_conv")(x, train)
        y = y.reshape(b, h, w, self.nh, hc) * jnp.transpose(aw, (0, 2, 3, 1))[..., None]
        return y.reshape(b, h, w, self.c2)


class C2fAttn(nn.Module):
    """C2f with a text-guided attention tail branch (reference block.py:456)."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        from .blocks import Bottleneck

        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0,
                                 dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        ys.append(MaxSigmoidAttnBlock(c, nh=self.nh, ec=self.ec, gc=self.gc,
                                      dtype=self.dtype, name="attn")(ys[-1], guide, train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2").call_parts(ys, train)


class ImagePoolingAttn(nn.Module):
    """Enhance text embeddings with pooled image features (block.py:483).
    Returns the UPDATED text embeddings."""

    ec: int = 256
    ch: Tuple[int, ...] = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, text, train: bool = False):
        b = xs[0].shape[0]
        hc = self.ec // self.nh
        tokens = []
        # child names mirror the torch tree (Sequential(LN, Linear) → _0/_1,
        # projections ModuleList) so port_state_dict maps mechanically
        for i, x in enumerate(xs):
            p = nn.Conv(self.ec, (1, 1), dtype=self.dtype, name=f"projections_{i}")(x)
            tokens.append(adaptive_max_pool2d(p, (self.k, self.k)).reshape(b, -1, self.ec))
        t = jnp.concatenate(tokens, axis=1)  # (B, nf*k², ec)
        q = nn.Dense(self.ec, dtype=self.dtype, name="query_1")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="query_0")(text))
        kk = nn.Dense(self.ec, dtype=self.dtype, name="key_1")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="key_0")(t))
        v = nn.Dense(self.ec, dtype=self.dtype, name="value_1")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="value_0")(t))
        q = q.reshape(b, -1, self.nh, hc)
        kk = kk.reshape(b, -1, self.nh, hc)
        v = v.reshape(b, -1, self.nh, hc)
        aw = jax.nn.softmax(jnp.einsum("bnmc,bkmc->bmnk", q, kk) / (hc**0.5), axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(b, -1, self.ec)
        out = nn.Dense(self.ct, dtype=self.dtype, name="proj")(out)
        s = self.param("scale_p", nn.initializers.zeros, (1,)) if self.scale else 1.0
        return out * s + text


class ContrastiveHead(nn.Module):
    """Region-text similarity head, l2-normalized (block.py:529)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w):
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,))
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(jnp.log(1 / 0.07)), ())
        xn = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        wn = w / jnp.clip(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", xn, wn)
        return sim * jnp.exp(logit_scale) + bias


class BNContrastiveHead(nn.Module):
    """BatchNorm variant of the contrastive head (block.py:547)."""

    embed_dims: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        bias = self.param("bias", nn.initializers.constant(-10.0), (1,))
        logit_scale = self.param("logit_scale", nn.initializers.constant(-1.0), ())
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="norm")(x)
        wn = w / jnp.clip(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, wn)
        return sim * jnp.exp(logit_scale) + bias


class WorldDetect(nn.Module):
    """Detect with text-contrastive class branch (head.py:457). Returns raw
    (B, H, W, 4*reg_max + K) maps where K = number of text prompts."""

    nc: int = 80
    embed: int = 512
    with_bn: bool = False
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, text, train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(xs):
            box = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            box = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(box, train)
            box = Conv2d(4 * self.reg_max, 1, dtype=self.dtype, name=f"cv2_{i}_2")(box)
            emb = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            emb = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(emb, train)
            emb = Conv2d(self.embed, 1, dtype=self.dtype, name=f"cv3_{i}_2")(emb)
            if self.with_bn:
                cls = BNContrastiveHead(self.embed, dtype=self.dtype, name=f"cv4_{i}")(emb, text, train)
            else:
                cls = ContrastiveHead(dtype=self.dtype, name=f"cv4_{i}")(emb, text)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs
