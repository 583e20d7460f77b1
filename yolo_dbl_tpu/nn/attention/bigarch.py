"""Attention pool, batch 4 — large research architectures (NHWC, flax).

Reference parity (nn/modules_attention/):
  * BiFormerNCHW / nchwBRA (BiFormer/bra_nchw.py:20): bi-level routing
    attention — region-level top-k routing (detached pooled q/k), token
    attention restricted to routed regions, LCE depthwise side path.
    Dense-masked formulation (regions ≤ 49 at detection scales).
  * Outlooker / Outlooker_YOLO (VOLO.py:45,103,772): outlook attention —
    per-center k²×k² attention weights predicted by a linear layer over the
    pooled map, applied to unfolded values and folded back.
  * AxialBlock / AxialBlock_YOLO (AxialNet.py:14,264,732): axial attention
    along H then W with learned relative positional (q/k/v) embeddings and
    the reference's BN-on-similarity trick.
  * DAT_YOLO (DAT/dat.py:942 over dat_blocks.py:129 DAttentionBaseline):
    deformable attention — offset network over grouped queries, bilinear
    sampling of k/v at deformed reference points. The SR-oriented
    ResidualGroup wrapper is reduced to depth× [LN→DAttention→MLP] with a
    tail conv (documented simplification; the deformable core is faithful).
  * DeBiAttentionBlock (DeBiFormer.py:996): deformable bi-level routing —
    BRA over deformably pre-sampled keys/values.
  * SwinTransformer/B/C (Swin_Transformer.py:122-159): windowed-attention
    stage wrappers re-using the structures-pool Swin blocks.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import grid_sample_bilinear
from ..common import Conv2d

Dtype = Any


class BiFormerNCHW(nn.Module):
    """Bi-level routing attention (reference bra_nchw.py:20)."""

    dim: int
    num_heads: int = 8
    n_win: int = 7
    topk: int = 4
    side_dwconv: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nw = self.n_win
        # pad so regions divide evenly (reference pads after projection)
        rh, rw = -(-h // nw), -(-w // nw)
        ph, pw = rh * nw - h, rw * nw - w
        qkv = Conv2d(3 * c, 1, dtype=self.dtype, name="qkv_linear")(x)
        qkv = jnp.pad(qkv, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # region-level adjacency on detached pooled q/k
        def region_pool(t):
            return jax.lax.stop_gradient(
                t.reshape(b, nw, rh, nw, rw, c).mean(axis=(2, 4))
            ).reshape(b, nw * nw, c)

        a_r = jnp.einsum("bic,bjc->bij", region_pool(q), region_pool(k))
        k_sel = min(self.topk, nw * nw)
        _, idx = jax.lax.top_k(a_r, k_sel)
        region_mask = jax.nn.one_hot(idx, nw * nw, dtype=bool).any(axis=-2)  # (B, R, R)

        # token attention restricted to routed regions
        def to_tokens(t):
            return t.reshape(b, nw, rh, nw, rw, c).transpose(0, 1, 3, 2, 4, 5).reshape(
                b, nw * nw, rh * rw, self.num_heads, c // self.num_heads
            )

        qt, kt, vt = to_tokens(q), to_tokens(k), to_tokens(v)
        scale = self.dim**-0.5
        sim = jnp.einsum("brnhd,bsmhd->bhrnsm", qt * scale, kt)
        mask = region_mask[:, None, :, None, :, None]
        sim = jnp.where(mask, sim, -jnp.inf)
        bsz = sim.shape
        attn = jax.nn.softmax(sim.reshape(*bsz[:4], -1), axis=-1).reshape(bsz)
        out = jnp.einsum("bhrnsm,bsmhd->brnhd", attn, vt)
        out = out.reshape(b, nw, nw, rh, rw, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        lepe = Conv2d(c, self.side_dwconv, p=self.side_dwconv // 2, g=c, dtype=self.dtype, name="lepe")(
            v.reshape(b, hp, wp, c)
        )
        out = (out + lepe)[:, :h, :w]
        return Conv2d(c, 1, dtype=self.dtype, name="output_linear")(out)


class OutlookAttention(nn.Module):
    """Outlook attention (reference VOLO.py:45), stride 1."""

    dim: int
    num_heads: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..upsample.carafe import _unfold_patches

        b, h, w, c = x.shape
        k = self.kernel_size
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="v")(x)
        v_p = _unfold_patches(v, k, 1)  # (B, H, W, C, k²)
        attn = nn.Dense(k**4 * nh, dtype=self.dtype, name="attn")(x)
        attn = attn.reshape(b, h, w, nh, k * k, k * k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        v_p = v_p.reshape(b, h, w, nh, hd, k * k)
        out_p = jnp.einsum("bhwnkm,bhwndm->bhwnkd", attn, v_p)  # weighted patches
        # fold: each center writes its k² patch back, overlapping sums
        out = jnp.zeros((b, h + 2 * (k // 2), w + 2 * (k // 2), c))
        out_p = out_p.reshape(b, h, w, c, k * k)
        p = k // 2
        for i in range(k):
            for j in range(k):
                out = out.at[:, i : i + h, j : j + w].add(out_p[..., i * k + j])
        out = out[:, p : p + h, p : p + w]
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class Outlooker(nn.Module):
    """Outlook attention + MLP block (reference VOLO.py:103; _YOLO at :772)."""

    dim: int
    kernel_size: int = 3
    num_heads: int = 8
    mlp_ratio: float = 3.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + OutlookAttention(self.dim, self.num_heads, self.kernel_size, dtype=self.dtype, name="attn")(y, train)
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(z)
        return x + z


class AxialAttention(nn.Module):
    """Single-axis attention with relative q/k/v position embeddings and
    BN-regularized similarity (reference AxialNet.py:14).

    variant='full'    — stock MedT axial attention (AxialNet.py:14)
    variant='dynamic' — position terms gated by fixed priority factors
                        f_qr=f_kr=f_sve=0.1, f_sv=1.0 (AxialNet.py:101,
                        nn.Parameters with requires_grad=False)
    variant='wopos'   — no positional embeddings at all (AxialNet.py:197)
    """

    out_planes: int
    groups: int = 8
    kernel_size: int = 56
    width: bool = False
    variant: str = "full"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # axis handling: attend along H (width=False) or W (width=True)
        if self.width:
            x = jnp.swapaxes(x, 1, 2)  # (B, W, H, C) → attend along axis 2
        b, keep, l, c = x.shape
        gp = self.out_planes // self.groups
        qkv = nn.Dense(self.out_planes * 2, use_bias=False, dtype=self.dtype, name="qkv")(x)
        qkv = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_qkv")(qkv)
        qkv = qkv.reshape(b * keep, l, self.groups, gp * 2)
        q, k, v = jnp.split(qkv, [gp // 2, gp], axis=-1)

        if self.variant == "wopos":
            qk = jnp.einsum("nigc,njgc->ngij", q, k)
            sim = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_similarity")(
                qk.transpose(0, 2, 3, 1)
            ).transpose(0, 3, 1, 2)
            attn = jax.nn.softmax(sim, axis=-1)
            sv = jnp.einsum("ngij,njgc->nigc", attn, v)
            out = sv.reshape(b * keep, l, self.out_planes)
            out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_output")(out)
            out = out.reshape(b, keep, l, self.out_planes)
            if self.width:
                out = jnp.swapaxes(out, 1, 2)
            return out

        rel = self.param("relative", nn.initializers.normal(1.0), (gp * 2, 2 * self.kernel_size - 1))
        qi = jnp.arange(self.kernel_size)[None, :]
        ki = jnp.arange(self.kernel_size)[:, None]
        idx = (ki - qi + self.kernel_size - 1).reshape(-1)
        emb = rel[:, idx].reshape(gp * 2, self.kernel_size, self.kernel_size)
        if l != self.kernel_size:
            emb = jax.image.resize(emb, (gp * 2, l, l), "linear")
        q_emb, k_emb, v_emb = jnp.split(emb, [gp // 2, gp], axis=0)

        dyn = self.variant == "dynamic"
        f_qr, f_kr, f_sv, f_sve = (0.1, 0.1, 1.0, 0.1) if dyn else (1.0, 1.0, 1.0, 1.0)
        qk = jnp.einsum("nigc,njgc->ngij", q, k)
        qr = jnp.einsum("nigc,cij->ngij", q, q_emb) * f_qr
        kr = jnp.einsum("njgc,cij->ngij", k, k_emb).transpose(0, 1, 3, 2) * f_kr
        stacked = jnp.concatenate([qk, qr, kr], axis=1)  # (N, 3g, L, L)
        stacked = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_similarity")(
            stacked.transpose(0, 2, 3, 1)
        ).transpose(0, 3, 1, 2)
        sim = stacked.reshape(b * keep, 3, self.groups, l, l).sum(axis=1)
        attn = jax.nn.softmax(sim, axis=-1)
        sv = jnp.einsum("ngij,njgc->nigc", attn, v) * f_sv
        sve = jnp.einsum("ngij,cij->nigc", attn, v_emb) * f_sve
        out = jnp.concatenate([sv, sve], axis=-1).reshape(b * keep, l, self.groups * gp * 2)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_output")(out)
        out = out.reshape(b, keep, l, self.out_planes, 2).sum(axis=-1)
        if self.width:
            out = jnp.swapaxes(out, 1, 2)
        return out


class AxialBlock(nn.Module):
    """Axial bottleneck: 1×1 down → H-axis attn → W-axis attn → 1×1 up ×2,
    residual (reference AxialNet.py:264; _YOLO at :732 uses planes=c1//2).
    variant selects the inner attention: 'full' (AxialBlock), 'dynamic'
    (AxialBlock_dynamic, AxialNet.py:307), 'wopos' (AxialBlock_wopos,
    AxialNet.py:348)."""

    planes: int
    groups: int = 1
    kernel_size: int = 56
    variant: str = "full"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        width = self.planes

        def conv_bn(y, cc, name):
            y = nn.Conv(cc, (1, 1), use_bias=False, dtype=self.dtype, name=f"{name}_conv")(y)
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"{name}_bn")(y)

        y = nn.relu(conv_bn(x, width, "down"))
        y = AxialAttention(width, self.groups, self.kernel_size, width=False,
                           variant=self.variant, dtype=self.dtype, name="hight")(y, train)
        y = AxialAttention(width, self.groups, self.kernel_size, width=True,
                           variant=self.variant, dtype=self.dtype, name="width")(y, train)
        y = nn.relu(y)
        y = conv_bn(y, self.planes * 2, "up")
        if c1 != self.planes * 2:
            x = conv_bn(x, self.planes * 2, "downsample")
        return nn.relu(x + y)


class AxialBlock_dynamic(AxialBlock):
    """AxialBlock with gated position encoding (reference AxialNet.py:307)."""

    variant: str = "dynamic"


class AxialBlock_wopos(AxialBlock):
    """AxialBlock without positional embeddings (reference AxialNet.py:348)."""

    variant: str = "wopos"


class DAttention(nn.Module):
    """Deformable attention core (reference DAT/dat_blocks.py:129):
    grouped offset network → bilinear-sampled k/v at deformed reference
    points → standard attention."""

    dim: int
    n_heads: int = 4
    n_groups: int = 2
    stride: int = 2
    offset_range_factor: float = 2.0
    ksize: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        gc = c // self.n_groups
        hd = c // self.n_heads
        scale = hd**-0.5
        q = Conv2d(c, 1, dtype=self.dtype, name="proj_q")(x)

        # offsets per group from strided depthwise conv stack
        qg = q.reshape(b, h, w, self.n_groups, gc).transpose(0, 3, 1, 2, 4).reshape(b * self.n_groups, h, w, gc)
        off = Conv2d(gc, self.ksize, s=self.stride, p=self.ksize // 2, g=gc, dtype=self.dtype, name="off_dw")(qg)
        off = nn.gelu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="off_ln")(off))
        off = Conv2d(2, 1, bias=False, dtype=self.dtype, name="off_pw")(off)  # (BG, Hk, Wk, 2)
        hk, wk = off.shape[1:3]
        if self.offset_range_factor > 0:
            rng = jnp.array([1.0 / max(hk, 1), 1.0 / max(wk, 1)], off.dtype)
            off = jnp.tanh(off) * rng * self.offset_range_factor

        ref_y = (jnp.arange(hk) + 0.5) / hk * 2 - 1
        ref_x = (jnp.arange(wk) + 0.5) / wk * 2 - 1
        gy, gx = jnp.meshgrid(ref_y, ref_x, indexing="ij")
        grid = jnp.stack([gx, gy], -1)[None] + off[..., ::-1]  # xy order
        xg = x.reshape(b, h, w, self.n_groups, gc).transpose(0, 3, 1, 2, 4).reshape(b * self.n_groups, h, w, gc)
        sampled = grid_sample_bilinear(xg, jnp.clip(grid, -1, 1))  # (BG, Hk, Wk, gc)
        sampled = sampled.reshape(b, self.n_groups, hk * wk, gc).reshape(b, self.n_groups, hk * wk, gc)
        sampled = sampled.transpose(0, 2, 1, 3).reshape(b, hk * wk, c)

        kk = nn.Dense(c, dtype=self.dtype, name="proj_k")(sampled).reshape(b, -1, self.n_heads, hd)
        vv = nn.Dense(c, dtype=self.dtype, name="proj_v")(sampled).reshape(b, -1, self.n_heads, hd)
        qq = q.reshape(b, h * w, self.n_heads, hd)
        attn = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", qq * scale, kk), axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vv).reshape(b, h, w, c)
        return Conv2d(c, 1, dtype=self.dtype, name="proj_out")(out)


class DAT(nn.Module):
    """DAT_YOLO block (reference dat.py:942): depth× [LN → deformable
    attention → LN → MLP] + tail 3×3 conv, all residual. The SR ResidualGroup
    internals (split-size windows, CSWin mixing) are reduced to the
    deformable-attention essence."""

    c1: int
    num_heads: int = 4
    depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for i in range(self.depth):
            z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln1_{i}")(y)
            y = y + DAttention(self.c1, self.num_heads, dtype=self.dtype, name=f"attn_{i}")(z, train)
            z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln2_{i}")(y)
            z = nn.Dense(self.c1 * 4, dtype=self.dtype, name=f"mlp1_{i}")(z)
            z = nn.gelu(z)
            y = y + nn.Dense(self.c1, dtype=self.dtype, name=f"mlp2_{i}")(z)
        y = Conv2d(self.c1, 3, p=1, dtype=self.dtype, name="tail")(y)
        return x + y


class DeBiAttentionBlock(nn.Module):
    """Deformable bi-level routing attention (reference DeBiFormer.py:996):
    BRA applied over deformably resampled features."""

    dim: int
    num_heads: int = 8
    n_win: int = 7
    topk: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = DAttention(self.dim, self.num_heads, dtype=self.dtype, name="deform")(x, train)
        return BiFormerNCHW(self.dim, self.num_heads, self.n_win, self.topk, dtype=self.dtype, name="bra")(y, train)


class SwinTransformer(nn.Module):
    """Windowed-attention stage wrapper (reference modules_attention/
    Swin_Transformer.py:122 SwinTransformer; B/C variants change depth)."""

    c1: int
    c2: int = 0
    num_heads: int = 8
    window_size: int = 7
    depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..structures.swin import SwinTransformerBlock

        c2 = self.c2 or self.c1
        if x.shape[-1] != c2:
            x = Conv2d(c2, 1, dtype=self.dtype, name="proj")(x)
        for i in range(self.depth):
            x = SwinTransformerBlock(
                c2, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                dtype=self.dtype, name=f"blk{i}",
            )(x, train)
        return x


class DeBiAttention_YOLO(nn.Module):
    """YOLO wrapper for deformable bi-level routing attention (reference
    DeBiFormer.py:1136): optional 1×1 projection when c1 ≠ c2, then the
    DeBiLevelRoutingAttention core (here DeBiAttentionBlock, the same
    deform→BRA composition, with auto-pad handled inside BiFormerNCHW)."""

    c1: int
    c2: int = 0
    num_heads: int = 8
    n_win: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = self.c2 or self.c1
        if x.shape[-1] != c2:
            x = Conv2d(c2, 1, dtype=self.dtype, name="project")(x)
        return DeBiAttentionBlock(c2, self.num_heads, self.n_win,
                                  dtype=self.dtype, name="attn")(x, train)


class ShiftWindowAttention(nn.Module):
    """Shifted-window attention (reference DAT/dat_blocks.py:92
    ShiftWindowAttention over LocalAttention:30): roll by -shift, W-MSA with
    the static SW-MSA mask and relative position bias, roll back."""

    dim: int
    heads: int = 8
    window_size: int = 7
    shift_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..structures.swin import (WindowAttention, _shift_mask,
                                       window_partition, window_reverse)

        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size if min(h, w) > ws else 0
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        y = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hp, wp, ws, shift))
        else:
            mask = None
        wins = window_partition(y, ws).reshape(-1, ws * ws, c)
        wins = WindowAttention(self.dim, ws, self.heads, dtype=self.dtype,
                               name="attn")(wins, mask, train)
        y = window_reverse(wins.reshape(-1, ws, ws, c), ws, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        return y[:, :h, :w]


class FusedKQnA(nn.Module):
    """Fused query-and-attend (reference DAT/qna.py:17): n_q learned queries
    attend to every pixel; numerator/denominator aggregation over k×k
    neighborhoods expressed as grouped depthwise convs whose kernels are the
    (activated) relative-position-bias × attn-scale tables — identical math,
    MXU/VPU-friendly (no unfold)."""

    n_q: int
    n_channels: int
    n_heads: int = 8
    ksize: int = 3
    stride: int = 1
    padding: int = 1
    qna_activation: str = "exp"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        hs = self.n_heads * self.stride
        cs = self.n_channels * self.stride
        hc = self.n_channels // self.n_heads
        k = nn.Dense(cs, use_bias=False, dtype=self.dtype, name="proj_k")(x)
        v = nn.Dense(cs, use_bias=False, dtype=self.dtype, name="proj_v")(x)
        q = self.param("q_param", nn.initializers.truncated_normal(math.sqrt(1.0 / hc)),
                       (self.n_q, cs))
        attn_scale = self.param("attn_scale", nn.initializers.normal(0.02),
                                (self.ksize * self.ksize, self.n_q * hs))
        rpb = self.param("rpb_table", nn.initializers.truncated_normal(0.02),
                         (self.ksize * self.ksize, self.n_q * hs))

        qh = q.reshape(self.n_q, hs, hc).astype(x.dtype) * hc ** -0.5
        kh = k.reshape(b, h * w, hs, hc)
        # (B, N, n_q, heads·stride) pixel-query affinity
        qkT = jnp.einsum("qgc,bngc->bnqg", qh, kh)

        def act(t):
            if self.qna_activation == "exp":
                return jnp.exp(t - jax.lax.stop_gradient(t.max()))
            if self.qna_activation == "sigmoid":
                return jax.nn.sigmoid(t)
            return t

        cost = act(qkT)  # (B, N, n_q, hs)
        rpb_act = act(rpb).reshape(self.ksize, self.ksize, 1, self.n_q * hs)
        scale_k = attn_scale.reshape(self.ksize, self.ksize, 1, self.n_q * hs)

        # numerator: depthwise conv of cost-weighted values with the
        # (rpb·scale) kernel, one filter per (q, head, channel)
        vq = cost[..., None] * v.reshape(b, h * w, 1, hs, hc)
        vq = vq.reshape(b, h, w, self.n_q * hs * hc)
        num_kern = jnp.repeat(rpb_act * scale_k, hc, axis=3).astype(x.dtype)
        num = jax.lax.conv_general_dilated(
            vq, num_kern, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.n_q * hs * hc)
        # denominator: same aggregation of the bare affinities
        cq = cost.reshape(b, h, w, self.n_q * hs)
        den = jax.lax.conv_general_dilated(
            cq, rpb_act.astype(x.dtype), (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.n_q * hs)
        ho, wo = num.shape[1:3]
        out = num.reshape(b, ho, wo, self.n_q, hs * hc) / (
            den.reshape(b, ho, wo, self.n_q, hs)[..., None]
            .repeat(hc, axis=-1).reshape(b, ho, wo, self.n_q, hs * hc))
        out = out.sum(axis=3)  # (B, Ho, Wo, C·stride)
        return Conv2d(cs, 1, bias=False, dtype=self.dtype, name="proj_out")(out)
