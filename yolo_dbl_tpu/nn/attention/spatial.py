"""Token/spatial attention pool, batch 2 (NHWC, flax.linen).

Reference parity targets (nn/modules_attention/): EfficientAttention
(EfficientAttention.py:6), HiLo (HiLo.py:9), FullyAttentionalBlock
(FullyAttentional.py:102), NLBlockND/NonLocalBlock2D (NonLocal.py:8,163,
'embedded' mode), MHSA_YOLO (MHSA.py:217), BoTAttention_YOLO
(BoTNetAttention.py:245, absolute position variant), EdgeAwareAttention
(MyAttention/EdgeAware.py:5). All attention matmuls are batched einsums
that tile directly onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import Conv2d

Dtype = Any


class EfficientAttention(nn.Module):
    """Linear attention: softmax(K) V^T then Q-weighted read-back
    (reference EfficientAttention.py:6). O(N) in sequence length."""

    in_channels: int
    key_channels: int = 8
    head_count: int = 0  # 0 → in_channels (reference default)
    value_channels: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        kc = self.key_channels
        heads = self.head_count or c
        vc = self.value_channels or c
        n = h * w
        keys = Conv2d(kc, 1, dtype=self.dtype, name="keys")(x).reshape(b, n, kc)
        queries = Conv2d(kc, 1, dtype=self.dtype, name="queries")(x).reshape(b, n, kc)
        values = Conv2d(vc, 1, dtype=self.dtype, name="values")(x).reshape(b, n, vc)
        hk, hv = kc // heads, vc // heads
        keys = jax.nn.softmax(keys.reshape(b, n, heads, hk), axis=1)  # softmax over positions
        queries = jax.nn.softmax(queries.reshape(b, n, heads, hk), axis=-1)  # over key dim
        values = values.reshape(b, n, heads, hv)
        context = jnp.einsum("bnhk,bnhv->bhkv", keys, values)
        out = jnp.einsum("bhkv,bnhk->bnhv", context, queries).reshape(b, h, w, vc)
        out = Conv2d(c, 1, dtype=self.dtype, name="reprojection")(out)
        return out + x


class HiLo(nn.Module):
    """Hi/Lo-frequency split attention (reference HiLo.py:9): windowed
    attention for high-freq heads, pooled-KV global attention for low-freq."""

    dim: int
    num_heads: int = 8
    window_size: int = 2
    alpha: float = 0.5
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h0, w0, c = x.shape
        head_dim = c // self.num_heads
        l_heads = int(self.num_heads * self.alpha)
        h_heads = self.num_heads - l_heads
        l_dim, h_dim = l_heads * head_dim, h_heads * head_dim
        ws = self.window_size
        if ws == 1:
            l_heads, l_dim, h_heads, h_dim = self.num_heads, c, 0, 0
        scale = head_dim**-0.5

        pad_h = (ws - h0 % ws) % ws
        pad_w = (ws - w0 % ws) % ws
        x_p = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        h, w = x_p.shape[1:3]

        outs = []
        if h_heads > 0:
            hg, wg = h // ws, w // ws
            xs = x_p.reshape(b, hg, ws, wg, ws, c).transpose(0, 1, 3, 2, 4, 5)
            xs = xs.reshape(b, hg * wg, ws * ws, c)
            qkv = nn.Dense(h_dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="h_qkv")(xs)
            qkv = qkv.reshape(b, hg * wg, ws * ws, 3, h_heads, head_dim)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            attn = jnp.einsum("bgnhd,bgmhd->bghnm", q, k) * scale
            attn = jax.nn.softmax(attn, axis=-1)
            o = jnp.einsum("bghnm,bgmhd->bgnhd", attn, v).reshape(b, hg, wg, ws, ws, h_dim)
            o = o.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, h_dim)
            o = nn.Dense(h_dim, dtype=self.dtype, name="h_proj")(o)
            outs.append(o)
        if l_heads > 0:
            q = nn.Dense(l_dim, use_bias=self.qkv_bias, dtype=self.dtype, name="l_q")(x_p)
            q = q.reshape(b, h * w, l_heads, head_dim)
            if ws > 1:
                xk = x_p.reshape(b, h // ws, ws, w // ws, ws, c).mean(axis=(2, 4))
                xk = xk.reshape(b, -1, c)
            else:
                xk = x_p.reshape(b, -1, c)
            kv = nn.Dense(l_dim * 2, use_bias=self.qkv_bias, dtype=self.dtype, name="l_kv")(xk)
            kv = kv.reshape(b, -1, 2, l_heads, head_dim)
            k, v = kv[:, :, 0], kv[:, :, 1]
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
            attn = jax.nn.softmax(attn, axis=-1)
            o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, l_dim)
            o = nn.Dense(l_dim, dtype=self.dtype, name="l_proj")(o)
            outs.append(o)
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        return out[:, :h0, :w0, :]


class FullyAttentionalBlock(nn.Module):
    """Full row/column channel-relation attention (reference FullyAttentional.py:102)."""

    plane: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # feat_h: (B*W, C, H); feat_w: (B*H, C, W)  (torch layouts)
        feat_h = jnp.transpose(x, (0, 2, 3, 1)).reshape(b * w, c, h)
        feat_w = jnp.transpose(x, (0, 1, 3, 2)).reshape(b * h, c, w)
        enc_h = nn.Dense(c, dtype=self.dtype, name="conv1")(x.mean(axis=2))  # (B, H, C)
        enc_w = nn.Dense(c, dtype=self.dtype, name="conv2")(x.mean(axis=1))  # (B, W, C)
        enc_h = jnp.tile(enc_h, (w, 1, 1))  # (B*W, H, C)
        enc_w = jnp.tile(enc_w, (h, 1, 1))  # (B*H, W, C)
        energy_h = jnp.einsum("bch,bhd->bcd", feat_h, enc_h)  # (B*W, C, C)
        energy_w = jnp.einsum("bcw,bwd->bcd", feat_w, enc_w)
        rel_h = jax.nn.softmax(energy_h, axis=-1)
        rel_w = jax.nn.softmax(energy_w, axis=-1)
        aug_h = jnp.einsum("bcd,bdh->bch", rel_h, feat_h).reshape(b, w, c, h)
        aug_w = jnp.einsum("bcd,bdw->bcw", rel_w, feat_w).reshape(b, h, c, w)
        aug_h = jnp.transpose(aug_h, (0, 3, 1, 2))  # (B, H, W, C)
        aug_w = jnp.transpose(aug_w, (0, 1, 3, 2))
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        out = gamma.astype(x.dtype) * (aug_h + aug_w) + x
        out = Conv2d(c, 3, p=1, bias=False, dtype=self.dtype, name="conv_out")(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(out)
        return nn.relu(out)


class NonLocalBlock2D(nn.Module):
    """Non-local block, embedded-gaussian mode with subsampling
    (reference NonLocal.py:8; NonLocalBlock2D at :163). W_z BN scale is
    zero-initialized so the block starts as identity."""

    in_channels: int
    inter_channels: int = 0
    sub_sample: bool = True
    bn_layer: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ic = self.inter_channels or max(c // 2, 1)
        g = Conv2d(ic, 1, dtype=self.dtype, name="g")(x)
        theta = Conv2d(ic, 1, dtype=self.dtype, name="theta")(x).reshape(b, h * w, ic)
        phi = Conv2d(ic, 1, dtype=self.dtype, name="phi")(x)
        if self.sub_sample:
            g = g[:, : (h // 2) * 2, : (w // 2) * 2].reshape(b, h // 2, 2, w // 2, 2, ic).max(axis=(2, 4))
            phi = phi[:, : (h // 2) * 2, : (w // 2) * 2].reshape(b, h // 2, 2, w // 2, 2, ic).max(axis=(2, 4))
        g = g.reshape(b, -1, ic)
        phi = phi.reshape(b, -1, ic)
        f = jnp.einsum("bnc,bmc->bnm", theta, phi)
        f = jax.nn.softmax(f, axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", f, g).reshape(b, h, w, ic)
        if self.bn_layer:
            y = Conv2d(c, 1, dtype=self.dtype, name="w_z")(y)
            y = nn.BatchNorm(use_running_average=not train, scale_init=nn.initializers.zeros,
                             dtype=self.dtype, name="w_z_bn")(y)
        else:
            y = Conv2d(c, 1, dtype=self.dtype, name="w_z")(y)
        return y + x


class MHSA(nn.Module):
    """ViT-style transformer block on flattened tokens (reference MHSA.py:217
    MHSA_YOLO + MHSABlock at :26): LN→MHA→residual, LN→MLP(2x)→residual."""

    c1: int
    c2: int = 0
    num_heads: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        c2 = self.c2 or c
        if c2 != c:
            x = Conv2d(c2, 1, dtype=self.dtype, name="proj")(x)
            c = c2
        tokens = x.reshape(b, h * w, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(tokens)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout, deterministic=not train,
            dtype=self.dtype, name="self_attention",
        )(y, y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        tokens = tokens + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(tokens)
        z = nn.Dense(c * 2, dtype=self.dtype, name="mlp_fc1")(z)
        z = nn.gelu(z)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        z = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(z)
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        return (tokens + z).reshape(b, h, w, c)


class BoTAttention(nn.Module):
    """Bottleneck-transformer attention with absolute 2-D position embedding
    (reference BoTNetAttention.py:245). The reference re-creates the position
    embedding unparameterized every forward; here it is a proper learnable
    parameter sized to the traced feature map."""

    dim: int
    heads: int = 4
    dim_head: int = 128
    channel_adjust: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        qkv = Conv2d(inner * 3, 1, bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q * scale
        emb_h = self.param("rel_height", nn.initializers.normal(scale), (h, self.dim_head))
        emb_w = self.param("rel_width", nn.initializers.normal(scale), (w, self.dim_head))
        emb = (emb_h[:, None, :] + emb_w[None, :, :]).reshape(h * w, self.dim_head).astype(q.dtype)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) + jnp.einsum("bnhd,md->bhnm", q, emb)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, inner)
        if self.channel_adjust:
            out = Conv2d(self.dim, 1, dtype=self.dtype, name="adjust_conv")(out)
            out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="adjust_bn")(out)
        return out


class EdgeAwareAttention(nn.Module):
    """Author-written edge-prior attention (reference MyAttention/EdgeAware.py:5):
    detached Sobel magnitude drives a channel MLP + 4-channel spatial gate,
    each with a learnable residual gain."""

    in_channels: int
    reduction: int = 16
    ksize: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 4.0
        ky = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32) / 4.0
        xd = jax.lax.stop_gradient(x).astype(jnp.float32)

        def sobel(k):
            kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
            return jax.lax.conv_general_dilated(
                xd, kernel, (1, 1), [(1, 1), (1, 1)], feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        gx, gy = sobel(kx), sobel(ky)
        g = jnp.sqrt(gx * gx + gy * gy + 1e-12).astype(x.dtype)

        hidden = max(8, c // self.reduction)
        c_vec = g.mean(axis=(1, 2))
        cw = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="mlp_fc1")(c_vec)
        cw = nn.relu(cw)
        cw = nn.Dense(c, use_bias=False, dtype=self.dtype, name="mlp_fc2")(cw)
        cgate = nn.sigmoid(cw)[:, None, None, :]
        cgate = Conv2d(c, 1, dtype=self.dtype, name="c_gain")(cgate)

        s_in = jnp.concatenate(
            [x.mean(-1, keepdims=True), x.max(-1, keepdims=True),
             g.mean(-1, keepdims=True), g.max(-1, keepdims=True)], axis=-1,
        )
        s = nn.sigmoid(Conv2d(1, self.ksize, p=self.ksize // 2, dtype=self.dtype, name="spatial")(s_in))
        s = Conv2d(1, 1, dtype=self.dtype, name="s_gain")(s)
        return x * (1 + cgate) * (1 + s)


_EDGE_KERNELS = {
    "sobel": (
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
        [[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
        4.0,
    ),
    "scharr": (
        [[3, 0, -3], [10, 0, -10], [3, 0, -3]],
        [[3, 10, 3], [0, 0, 0], [-3, -10, -3]],
        16.0,
    ),
    "prewitt": (
        [[1, 0, -1], [1, 0, -1], [1, 0, -1]],
        [[1, 1, 1], [0, 0, 0], [-1, -1, -1]],
        3.0,
    ),
    "log": (
        [[0, 1, 0], [1, -4, 1], [0, 1, 0]],
        [[0, 1, 0], [1, -4, 1], [0, 1, 0]],
        1.0,
    ),
    "kirsch": (
        [[-3, -3, 5], [-3, 0, 5], [-3, -3, 5]],
        [[-3, -3, -3], [-3, 0, -3], [5, 5, 5]],
        1.0,
    ),
    "prewitt_alt": (
        [[1, 1, 1], [0, 0, 0], [-1, -1, -1]],
        [[1, 0, -1], [1, 0, -1], [1, 0, -1]],
        1.0,
    ),
    "sobel_alt": (
        [[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
        1.0,
    ),
}


class EdgeAwareAttentionV2(nn.Module):
    """Multi-operator edge-prior attention (reference MyAttention/EdgeAware.py:76).

    Upgrades over V1: a bank of learnable 3x3 edge kernels
    (Sobel/Scharr/Prewitt by default) normalized to zero-mean / unit-L1,
    Charbonnier edge magnitude, a softmax gate over the kernel bank driven by
    per-operator global response, and adaptive gains — alpha (per-image
    scalar or per-pixel map, softplus) on the spatial gate and beta
    (per-channel, softplus) on the channel gate:
    ``y = x * (1 + alpha*s) * (1 + beta*c)``.

    TPU mapping: the whole N-kernel bank runs as ONE depthwise conv with
    C*N output features (feature_group_count=C), so XLA lowers it to a single
    fused convolution rather than N small ones.
    """

    in_channels: int
    reduction: int = 16
    ksize: int = 7
    kernel_bank: tuple = ("sobel", "scharr", "prewitt")
    charbonnier_eps: float = 1e-3
    alpha_mode: str = "scalar"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.alpha_mode in ("scalar", "map")
        b, h, w, c = x.shape
        n = len(self.kernel_bank)

        def init_bank(idx):
            def init(key):
                rows = []
                for name in self.kernel_bank:
                    spec = _EDGE_KERNELS[name.lower()]
                    rows.append(jnp.asarray(spec[idx], jnp.float32) / spec[2])
                return jnp.stack(rows)  # (N, 3, 3)

            return init

        kx = self.param("kx", lambda k: init_bank(0)(k))
        ky = self.param("ky", lambda k: init_bank(1)(k))

        def normalize(kern):  # zero-mean + L1-normalize per kernel
            kern = kern - kern.mean(axis=(1, 2), keepdims=True)
            l1 = jnp.clip(jnp.abs(kern).sum(axis=(1, 2), keepdims=True), 1e-6)
            return kern / l1

        def edge_conv(kern):
            # HWIO depthwise with C groups x N kernels: out feature c*N + k_i
            hwio = jnp.tile(jnp.transpose(normalize(kern), (1, 2, 0))[:, :, None, :], (1, 1, 1, c))
            return jax.lax.conv_general_dilated(
                x.astype(jnp.float32), hwio, (1, 1), [(1, 1), (1, 1)],
                feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(b, h, w, c, n)

        gx, gy = edge_conv(kx), edge_conv(ky)
        g_bank = jnp.sqrt(gx * gx + gy * gy + self.charbonnier_eps**2)  # (B,H,W,C,N)

        # dynamic kernel selection from per-operator global response
        gate_desc = g_bank.mean(axis=(1, 2, 3)).astype(x.dtype)  # (B, N)
        gate_h = max(8, 2 * n)
        gw = nn.Dense(gate_h, dtype=self.dtype, name="gate_fc1")(gate_desc)
        gw = nn.Dense(n, dtype=self.dtype, name="gate_fc2")(nn.relu(gw))
        gate = jax.nn.softmax(gw, axis=-1)[:, None, None, None, :]
        g = (g_bank * gate.astype(g_bank.dtype)).sum(axis=-1).astype(x.dtype)  # (B,H,W,C)

        # channel attention from edge statistics
        hidden = max(8, c // self.reduction)
        c_vec = g.mean(axis=(1, 2))  # (B, C)
        cw = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="mlp_fc1")(c_vec)
        cw = nn.Dense(c, use_bias=False, dtype=self.dtype, name="mlp_fc2")(nn.relu(cw))
        cgate = nn.sigmoid(cw)[:, None, None, :]

        # spatial attention over (avg_x, max_x, avg_g, max_g)
        s_in = jnp.concatenate(
            [x.mean(-1, keepdims=True), x.max(-1, keepdims=True),
             g.mean(-1, keepdims=True), g.max(-1, keepdims=True)], axis=-1,
        )
        s = nn.sigmoid(Conv2d(1, self.ksize, p=self.ksize // 2, dtype=self.dtype, name="spatial")(s_in))

        # adaptive gains
        if self.alpha_mode == "scalar":
            stats = jnp.stack([g.mean(axis=(1, 2, 3)), g.max(axis=(1, 2, 3))], axis=1)
            a = nn.Dense(16, dtype=self.dtype, name="alpha_fc1")(stats)
            a = nn.Dense(1, dtype=self.dtype, name="alpha_fc2")(nn.relu(a))
            alpha = jax.nn.softplus(a)[:, :, None, None]  # (B,1,1,1)
        else:
            alpha = jax.nn.softplus(Conv2d(1, 1, dtype=self.dtype, name="alpha_conv")(s_in))
        bw = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="beta_fc1")(c_vec)
        bw = nn.Dense(c, use_bias=False, dtype=self.dtype, name="beta_fc2")(nn.relu(bw))
        beta = jax.nn.softplus(bw)[:, None, None, :]  # (B,1,1,C)

        return x * (1 + alpha * s) * (1 + beta * cgate)
