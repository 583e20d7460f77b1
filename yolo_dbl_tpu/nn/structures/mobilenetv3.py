"""MobileNetV3 (NHWC, flax).

Reference parity: nn/structures/MobileNetv3.py — h-swish/h-sigmoid
activations, the divisible-width SE layer (:53), InvertedResidual (:87,
expand→depthwise→SE→project with identity skip), and the full
large/small classifiers (:187,:208 cfgs).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _make_divisible(v, divisor=8, min_value=None):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


class MNV3SELayer(nn.Module):
    """SE with divisible hidden width and h-sigmoid gate (MobileNetv3.py:53)."""

    channel: int
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = _make_divisible(self.channel // self.reduction, 8)
        y = x.mean(axis=(1, 2))
        y = nn.relu(nn.Dense(hidden, dtype=self.dtype, name="fc1")(y))
        y = h_sigmoid(nn.Dense(self.channel, dtype=self.dtype, name="fc2")(y))
        return x * y[:, None, None, :]


def _conv_bn(x, feats, k, s, name, act, train, dtype):
    x = nn.Conv(feats, (k, k), strides=(s, s), padding=(k - 1) // 2,
                use_bias=False, feature_group_count=1, dtype=dtype, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, dtype=dtype, name=f"{name}_bn")(x)
    return act(x) if act else x


class InvertedResidual(nn.Module):
    """MobileNetV3 inverted residual (MobileNetv3.py:87)."""

    hidden_dim: int
    oup: int
    kernel_size: int = 3
    stride: int = 1
    use_se: bool = True
    use_hs: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        act = h_swish if self.use_hs else nn.relu
        k, s, hd = self.kernel_size, self.stride, self.hidden_dim
        y = x
        if inp != hd:
            y = _conv_bn(y, hd, 1, 1, "pw", act, train, self.dtype)
        # depthwise
        y = nn.Conv(hd, (k, k), strides=(s, s), padding=(k - 1) // 2,
                    feature_group_count=hd, use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="dw_bn")(y)
        if inp == hd:
            y = act(y)
            if self.use_se:
                y = MNV3SELayer(hd, dtype=self.dtype, name="se")(y)
        else:
            if self.use_se:
                y = MNV3SELayer(hd, dtype=self.dtype, name="se")(y)
            y = act(y)
        y = _conv_bn(y, self.oup, 1, 1, "pw_linear", None, train, self.dtype)
        if s == 1 and inp == self.oup:
            return x + y
        return y


# (k, t, c, use_se, use_hs, s) tables (MobileNetv3.py:187,:208)
MOBILENETV3_LARGE_CFGS = (
    (3, 1, 16, 0, 0, 1), (3, 4, 24, 0, 0, 2), (3, 3, 24, 0, 0, 1),
    (5, 3, 40, 1, 0, 2), (5, 3, 40, 1, 0, 1), (5, 3, 40, 1, 0, 1),
    (3, 6, 80, 0, 1, 2), (3, 2.5, 80, 0, 1, 1), (3, 2.3, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1), (3, 6, 112, 1, 1, 1), (3, 6, 112, 1, 1, 1),
    (5, 6, 160, 1, 1, 2), (5, 6, 160, 1, 1, 1), (5, 6, 160, 1, 1, 1),
)
MOBILENETV3_SMALL_CFGS = (
    (3, 1, 16, 1, 0, 2), (3, 4.5, 24, 0, 0, 2), (3, 3.67, 24, 0, 0, 1),
    (5, 4, 40, 1, 1, 2), (5, 6, 40, 1, 1, 1), (5, 6, 40, 1, 1, 1),
    (5, 3, 48, 1, 1, 1), (5, 3, 48, 1, 1, 1), (5, 6, 96, 1, 1, 2),
    (5, 6, 96, 1, 1, 1), (5, 6, 96, 1, 1, 1),
)


class MobileNetV3(nn.Module):
    """Full classifier (MobileNetv3.py:130)."""

    cfgs: Tuple = MOBILENETV3_LARGE_CFGS
    mode: str = "large"
    num_classes: int = 1000
    width_mult: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.mode in ("large", "small")
        c_in = _make_divisible(16 * self.width_mult, 8)
        x = _conv_bn(x, c_in, 3, 2, "stem", h_swish, train, self.dtype)
        exp = c_in
        for i, (k, t, c, se, hs, s) in enumerate(self.cfgs):
            out = _make_divisible(c * self.width_mult, 8)
            exp = _make_divisible(c_in * t, 8)
            x = InvertedResidual(exp, out, int(k), int(s), bool(se), bool(hs),
                                 dtype=self.dtype, name=f"ir{i}")(x, train)
            c_in = out
        x = _conv_bn(x, exp, 1, 1, "head", h_swish, train, self.dtype)
        x = x.mean(axis=(1, 2))
        out_ch = {"large": 1280, "small": 1024}[self.mode]
        if self.width_mult > 1.0:
            out_ch = _make_divisible(out_ch * self.width_mult, 8)
        x = h_swish(nn.Dense(out_ch, dtype=self.dtype, name="cls_fc1")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="cls_fc2")(x)


def mobilenetv3_large(**kw):
    return MobileNetV3(cfgs=MOBILENETV3_LARGE_CFGS, mode="large", **kw)


def mobilenetv3_small(**kw):
    return MobileNetV3(cfgs=MOBILENETV3_SMALL_CFGS, mode="small", **kw)
