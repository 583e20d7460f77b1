"""Sparse-Linear Attention (SLA) — XLA formulation of the reference's Triton
kernels.

Reference: nn/modules_attention/SLA/ (core.py:24 SparseLinearAttention,
core.py:102 SLA wrapper, kernel.py:21-491 Triton fwd/bwd, utils.py:57
get_block_map). Exact semantics reproduced from the kernels:

  * block map: mean-pooled Q-blocks × smooth-k pooled K-blocks → per-Q-block
    top-k K-block LUT (utils.py:57-66);
  * sparse branch o_s: softmax attention restricted to the selected key
    blocks (flash-style in the kernel; dense-masked here);
  * linear branch o_l: feature-mapped linear attention over the COMPLEMENT
    blocks — o_l = c_q·(Σ_comp c_kᵀv) / (c_q·Σ_comp c_k), zero when no
    complement (kernel.py:142-145 sets denom=inf);
  * output o_s + proj_l(o_l) with proj_l zero-initialized.

At the reference's sequence lengths (≤1600 tokens of P3-P5 maps) the dense
masked form is MXU-bound and fuses fully; a Pallas block-sparse kernel is
the designated follow-up for long sequences (SURVEY.md §2.11). Unlike the
reference, which degrades to `out_proj(x)` on CPU (core.py:133), this runs
identically on every backend.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import Conv2d

Dtype = Any


def _block_pool(x, blk):
    """(B, H, L, D) → (B, H, L/blk, D) mean over token blocks (zero-padded)."""
    b, h, l, d = x.shape
    nb = -(-l // blk)
    pad = nb * blk - l
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(b, h, nb, blk, d).sum(axis=3)
    counts = jnp.clip(
        jnp.minimum((jnp.arange(nb) + 1) * blk, l) - jnp.arange(nb) * blk, 1, blk
    ).astype(x.dtype)
    return sums / counts[None, None, :, None]


def sparse_linear_attention(q, k, v, c_q, c_k, topk_ratio=0.1, blkq=64, blkk=64):
    """Core SLA computation. q/k/v/c_q/c_k: (B, H, L, D). Returns (o_s, o_l)."""
    b, h, l, d = q.shape
    scale = d**-0.5
    qb = -(-l // blkq)
    kb = -(-l // blkk)

    # block map (utils.py get_block_map)
    arg_k = k - k.mean(axis=-2, keepdims=True)
    pq = _block_pool(q, blkq)  # (B, H, Qb, D)
    pk = _block_pool(arg_k, blkk)  # (B, H, Kb, D)
    block_score = jnp.einsum("bhqd,bhkd->bhqk", pq, pk)
    topk = max(1, min(kb, int(topk_ratio * kb)))
    _, lut = jax.lax.top_k(block_score, topk)
    block_mask = jax.nn.one_hot(lut, kb, dtype=bool).any(axis=-2)  # (B, H, Qb, Kb)

    # expand to token mask
    tok_mask = jnp.repeat(jnp.repeat(block_mask, blkq, axis=2), blkk, axis=3)[:, :, :l, :l]
    valid = jnp.ones((l,), bool)

    # sparse branch
    s = jnp.einsum("bhld,bhmd->bhlm", q, k) * scale
    s = jnp.where(tok_mask, s, -jnp.inf)
    o_s = jnp.einsum("bhlm,bhmd->bhld", jax.nn.softmax(s, axis=-1), v)

    # linear branch over complement blocks
    comp = ~tok_mask
    w = jnp.einsum("bhld,bhmd->bhlm", c_q, c_k) * comp.astype(q.dtype)
    denom = w.sum(axis=-1, keepdims=True)
    o_l = jnp.einsum("bhlm,bhmd->bhld", w, v) / jnp.where(denom > 0, denom, jnp.inf)
    return o_s, o_l


class SLA(nn.Module):
    """NHWC wrapper (reference core.py:102): 1×1 qkv/out projections, head
    split, sparse+linear attention, zero-init out_proj (block starts inert)."""

    in_channels: int
    num_heads: int = 4
    head_dim: int = 0
    topk: float = 0.1
    feature_map: str = "softmax"
    blkq: int = 64
    blkk: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        heads = self.num_heads
        hd = self.head_dim or c // heads
        l = hh * ww
        qkv = Conv2d(c * 3, 1, bias=False, dtype=self.dtype, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            # torch view(B, heads, head_dim, L): channel-major split
            t = t.reshape(b, l, heads, hd)
            return t.transpose(0, 2, 1, 3)  # (B, H, L, D)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        if self.feature_map == "softmax":
            fmap = lambda t: jax.nn.softmax(t, axis=-1)
        elif self.feature_map == "elu":
            fmap = lambda t: jax.nn.elu(t) + 1
        elif self.feature_map == "relu":
            fmap = jax.nn.relu
        else:
            raise NotImplementedError(self.feature_map)
        c_q, c_k = fmap(q), fmap(k)
        o_s, o_l = sparse_linear_attention(q, k, v, c_q, c_k, self.topk, self.blkq, self.blkk)
        o_l = nn.Dense(hd, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="proj_l")(o_l)
        o = o_s + o_l
        o = o.transpose(0, 2, 1, 3).reshape(b, hh, ww, c)
        # zero-init out projection: the block starts inert (reference core.py:121)
        return nn.Conv(c, (1, 1), use_bias=False, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="out_proj")(o)
