"""SFAU — spatial-frequency attention upsampler for pan-sharpening-style
fusion (NHWC, flax).

Reference parity: modules_upsample/SFAU/{SFAU.py:41, Block.py SpaBlock/Ddnf/
ChannelAttention/BasicConv}. The low-res input `x` (e.g. MS bands) is
upsampled by SAPA-style local attention whose queries come from a
spatial+frequency-domain encoding of the high-res guide `y` (e.g. PAN) fused
with bicubic-upsampled `x`; a learned sigmoid gate blends the attention
output with the encoded guide.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .carafe import _unfold_patches

Dtype = Any


def sfau_sim(q, k, kernel_size=5, scale=2):
    """Local q·k similarity (SFAU.py:6): HR query vs k×k LR key patches."""
    b, h, w, c = k.shape
    qv = q.reshape(b, h, scale, w, scale, c)
    ku = _unfold_patches(k, kernel_size)  # (B, H, W, C, k²)
    attn = jnp.einsum("bjklmn,bjlno->bjklmo", qv, ku)
    return attn.reshape(b, h * scale, w * scale, kernel_size * kernel_size)


def sfau_atn(attn, x, kernel_size=5, scale=2):
    """Apply HR attention over k×k LR value patches (SFAU.py:14)."""
    b, h, w, c = x.shape
    av = attn.reshape(b, h, scale, w, scale, kernel_size * kernel_size)
    xu = _unfold_patches(x, kernel_size)  # (B, H, W, C, k²)
    out = jnp.einsum("bjklmn,bjlon->bjklmo", av, xu)
    return out.reshape(b, h * scale, w * scale, c)


class _SE(nn.Module):
    """SE gate (SFAU Block.py:178)."""

    channel: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2))
        y = nn.Dense(max(self.channel // self.reduction, 1), use_bias=False,
                     dtype=self.dtype, name="fc1")(y)
        y = nn.Dense(self.channel, use_bias=False, dtype=self.dtype, name="fc2")(nn.relu(y))
        return x * nn.sigmoid(y)[:, None, None, :]


class SpaBlock(nn.Module):
    """Residual 3-conv spatial block, GELU on the first (Block.py:162)."""

    nc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.gelu(nn.Conv(self.nc, (3, 3), dtype=self.dtype, name="conv1")(x))
        y = nn.Conv(self.nc, (3, 3), dtype=self.dtype, name="trans")(y)
        y = nn.Conv(self.nc, (3, 3), dtype=self.dtype, name="conv2")(y)
        return y + x


class Ddnf(nn.Module):
    """Frequency-domain processing (Block.py:198): residual 1x1+SE refinement
    of rFFT magnitude and phase, then inverse FFT."""

    nc: int
    dtype: Dtype = jnp.float32

    def _branch(self, v, name):
        y = nn.Conv(self.nc, (1, 1), dtype=self.dtype, name=f"{name}_c1")(v)
        y = nn.leaky_relu(y, 0.1)
        y = _SE(self.nc, dtype=self.dtype, name=f"{name}_se")(y)
        return nn.Conv(self.nc, (1, 1), dtype=self.dtype, name=f"{name}_c2")(y)

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
        mag = jnp.abs(xf)
        pha = jnp.angle(xf)
        mag = mag + self._branch(mag, "mag")
        pha = pha + self._branch(pha, "pha")
        out = mag * jnp.cos(pha) + 1j * (mag * jnp.sin(pha))
        return jnp.fft.irfft2(out, s=(h, w), axes=(1, 2)).astype(x.dtype)


class DDNF(nn.Module):
    """Dual-domain fusion (SFAU.py:22): spatial + frequency branches merged
    by a channel-halving 1x1 conv."""

    nc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = Ddnf(self.nc, dtype=self.dtype, name="freq")(x)
        xs = SpaBlock(self.nc, dtype=self.dtype, name="spa")(x)
        return nn.Conv(self.nc // 2, (1, 1), dtype=self.dtype, name="cat")(
            jnp.concatenate([xs, xf], -1))


class ChannelAttention(nn.Module):
    """Residual channel attention (Block.py:258)."""

    channel: int
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.relu(nn.Conv(self.channel, (3, 3), dtype=self.dtype, name="p1")(x))
        r = nn.Conv(self.channel, (3, 3), dtype=self.dtype, name="p2")(r)
        y = r.mean(axis=(1, 2), keepdims=True)
        y = nn.relu(nn.Conv(self.channel // self.reduction, (1, 1), dtype=self.dtype, name="du1")(y))
        z = nn.sigmoid(nn.Conv(self.channel, (1, 1), dtype=self.dtype, name="du2")(y))
        return z * r + x


class SFAU(nn.Module):
    """Spatial-frequency attention upsampler (SFAU.py:41).

    __call__(x (B,h,w,Cx) low-res, y (B,h·s,w·s,Cy) high-res guide) →
    (final, attention_out, encoded_guide), each (B, h·s, w·s, Cx).
    """

    y_channels: int
    x_channels: int
    embedding_dim: int = 64
    k_up: int = 5
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        b, h, w, cx = x.shape
        s = self.scale
        up_x = jax.image.resize(x, (b, h * s, w * s, cx), "bicubic")
        gate = nn.sigmoid(nn.Conv(cx, (1, 1), dtype=self.dtype, name="gate")(up_x))

        g = nn.Conv(16, (1, 1), dtype=self.dtype, name="pan1a")(jnp.concatenate([y, up_x], -1))
        g = nn.Conv(16, (5, 5), dtype=self.dtype, name="pan1b")(g)
        g = DDNF(16, dtype=self.dtype, name="pan2")(g)  # -> 8 channels
        g = ChannelAttention(8, 4, dtype=self.dtype, name="refine")(g)
        enc = nn.Conv(cx, (1, 1), dtype=self.dtype, name="pan3")(g)

        yn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_y")(enc)
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_x")(x)
        q = nn.Dense(self.embedding_dim, dtype=self.dtype, name="q")(yn)
        k = nn.Dense(self.embedding_dim, dtype=self.dtype, name="k")(xn)
        attn = jax.nn.softmax(sfau_sim(q, k, self.k_up, s), axis=-1)
        sapa_out = sfau_atn(attn, x, self.k_up, s)

        final = gate * sapa_out + (1 - gate) * enc
        return final, sapa_out, enc
