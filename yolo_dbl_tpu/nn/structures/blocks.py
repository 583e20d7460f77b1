"""Backbone structures pool, batch 1 (NHWC, flax.linen).

Reference parity targets (nn/structures/): ExtractLayer (MyStructures.py:17),
FasterNet PConv/FasterBlock (FasterNet.py:161,180), ScConv SRU/CRU
(ScConv.py:28,57,96), EffBlock/MBConv (EfficientNetV2.py:80,231),
GhostModuleV2/GhostBottleneckV2 (GhostNetv2.py:70,127 — DFC attention mode),
RepViTBlock (RepViT.py:130 — Conv2d_BN/RepVGGDW/Residual/SqueezeExcite),
UIB (MobileNetv4.py UniversalInvertedBottleneckBlock), pinwheel APConv
family (APConv.py:8 PConv, :54 APBottleneck, :30 APC2f), RepGhostBottleneck
(RepGhost.py:511).

Torch re-parameterization fuse() paths (RepVGG/RepGhost) are train-form
only here — XLA's constant folding covers the inference fusion the torch
code does by hand.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resample import nearest_upsample
from ..common import Conv, Conv2d

Dtype = Any


class ExtractLayer(nn.Module):
    """Select one tensor from a tuple/list output (reference MyStructures.py:17)."""

    from_index: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x[self.from_index]


class PConv(nn.Module):
    """FasterNet partial conv: 3×3 on the first C/4 channels only
    (reference FasterNet.py:161), then BN+SiLU over the full tensor."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        c3 = c // 4
        x1 = nn.Conv(c3, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                     dtype=self.dtype, name="partial_conv3")(x[..., :c3])
        y = jnp.concatenate([x1, x[..., c3:]], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(y)
        return nn.silu(y)


class FasterBlock(nn.Module):
    """PConv + 1×1 Conv with residual (reference FasterNet.py:180)."""

    c2: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = PConv(c1, dtype=self.dtype, name="pconv")(x, train)
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="conv1")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class ScConv(nn.Module):
    """Spatial+channel reconstruction conv (reference ScConv.py:96): SRU
    GroupNorm gating + CRU split-transform-fuse."""

    op_channel: int
    group_num: int = 4
    gate_threshold: float = 0.5
    alpha: float = 0.5
    squeeze_radio: int = 2
    group_size: int = 2
    group_kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        # --- SRU --- (manual GroupNorm so gamma is visible for the gate weights)
        gamma = self.param("gn_scale", nn.initializers.ones, (c,))
        beta = self.param("gn_bias", nn.initializers.zeros, (c,))
        b_, h_, w_, _ = x.shape
        xg = x.reshape(b_, h_ * w_, self.group_num, c // self.group_num)
        mu = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        gn_x = ((xg - mu) / jnp.sqrt(var + 1e-5)).reshape(b_, h_, w_, c)
        gn_x = gn_x * gamma.astype(x.dtype) + beta.astype(x.dtype)
        w_gamma = (gamma / gamma.sum()).astype(x.dtype)
        rew = nn.sigmoid(gn_x * w_gamma)
        w1 = jnp.where(rew > self.gate_threshold, 1.0, rew)
        w2 = jnp.where(rew > self.gate_threshold, 0.0, rew)
        x1, x2 = w1 * x, w2 * x
        h = c // 2
        y = jnp.concatenate([x1[..., :h] + x2[..., h:], x1[..., h:] + x2[..., :h]], axis=-1)
        # --- CRU ---
        up_c = int(self.alpha * c)
        low_c = c - up_c
        up, low = y[..., :up_c], y[..., up_c:]
        up = Conv2d(up_c // self.squeeze_radio, 1, bias=False, dtype=self.dtype, name="squeeze1")(up)
        low = Conv2d(low_c // self.squeeze_radio, 1, bias=False, dtype=self.dtype, name="squeeze2")(low)
        y1 = Conv2d(c, self.group_kernel_size, p=self.group_kernel_size // 2, g=self.group_size,
                    dtype=self.dtype, name="gwc")(up) + Conv2d(c, 1, bias=False, dtype=self.dtype, name="pwc1")(up)
        y2 = jnp.concatenate(
            [Conv2d(c - low_c // self.squeeze_radio, 1, bias=False, dtype=self.dtype, name="pwc2")(low), low],
            axis=-1,
        )
        out = jnp.concatenate([y1, y2], axis=-1)
        att = jax.nn.softmax(out.mean(axis=(1, 2), keepdims=True), axis=-1)
        out = att * out
        return out[..., : out.shape[-1] // 2] + out[..., out.shape[-1] // 2 :]


class _EffSE(nn.Module):
    """EfficientNet SE with hardsigmoid-free gating (reference EfficientNetV2 SELayer)."""

    inp: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2))
        y = nn.silu(nn.Dense(self.inp // 4, dtype=self.dtype, name="fc1")(y))
        y = nn.sigmoid(nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(y))
        return x * y[:, None, None, :]


class MBConv(nn.Module):
    """EfficientNetV2 (fused-)MBConv (reference EfficientNetV2.py:80)."""

    oup: int
    stride: int = 1
    expand_ratio: float = 1.0
    use_se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = round(inp * self.expand_ratio)
        identity = self.stride == 1 and inp == self.oup

        def conv_bn(y, c, k, s, g, name, act=True):
            p = k // 2
            y = nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)], feature_group_count=g,
                        use_bias=False, dtype=self.dtype, name=f"{name}_c")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"{name}_bn")(y)
            return nn.silu(y) if act else y

        if self.use_se:
            y = conv_bn(x, hidden, 1, 1, 1, "pw")
            y = conv_bn(y, hidden, 3, self.stride, hidden, "dw")
            y = _EffSE(inp, hidden, dtype=self.dtype, name="se")(y)
            y = conv_bn(y, self.oup, 1, 1, 1, "pw_lin", act=False)
        else:
            y = conv_bn(x, hidden, 3, self.stride, 1, "fused")
            y = conv_bn(y, self.oup, 1, 1, 1, "pw_lin", act=False)
        return x + y if identity else y


class EffBlock(nn.Module):
    """Stacked MBConvs (reference EfficientNetV2.py:231)."""

    c2: int
    n: int = 1
    s: int = 1
    t: float = 1.0
    se: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = MBConv(self.c2, self.s, self.t, bool(self.se), dtype=self.dtype, name="m0")(x, train)
        for i in range(1, self.n):
            y = MBConv(self.c2, 1, self.t, bool(self.se), dtype=self.dtype, name=f"m{i}")(y, train)
        return y


class GhostModuleV2(nn.Module):
    """Ghost module with optional DFC attention (reference GhostNetv2.py:70)."""

    oup: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    stride: int = 1
    relu: bool = True
    mode: str = "original"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_c = math.ceil(self.oup / self.ratio)
        new_c = init_c * (self.ratio - 1)

        def conv_bn(y, c, k, s, g, name, p=None):
            p = k // 2 if p is None else p
            y = nn.Conv(c, (k, k) if isinstance(k, int) else k,
                        strides=(s, s), padding=[(p, p), (p, p)] if isinstance(p, int) else [p[0], p[1]],
                        feature_group_count=g, use_bias=False, dtype=self.dtype, name=f"{name}_c")(y)
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"{name}_bn")(y)

        x1 = conv_bn(x, init_c, self.kernel_size, self.stride, 1, "primary")
        if self.relu:
            x1 = nn.relu(x1)
        x2 = conv_bn(x1, new_c, self.dw_size, 1, init_c, "cheap")
        if self.relu:
            x2 = nn.relu(x2)
        out = jnp.concatenate([x1, x2], axis=-1)[..., : self.oup]
        if self.mode == "original":
            return out
        # DFC attention branch on a 2x-downsampled view
        b, h, w, _ = x.shape
        ds = x[:, : (h // 2) * 2, : (w // 2) * 2].reshape(b, h // 2, 2, w // 2, 2, x.shape[-1]).mean(axis=(2, 4))
        res = conv_bn(ds, self.oup, self.kernel_size, self.stride, 1, "short1")
        res = conv_bn(res, self.oup, (1, 5), 1, self.oup, "short2", p=(0, 2))
        res = conv_bn(res, self.oup, (5, 1), 1, self.oup, "short3", p=(2, 0))
        gate = nn.sigmoid(res)
        gate = jax.image.resize(gate, (b, out.shape[1], out.shape[2], self.oup), "nearest")
        return out * gate


class GhostBottleneckV2(nn.Module):
    """GhostNetV2 bottleneck (reference GhostNetv2.py:127)."""

    mid_chs: int
    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    layer_id: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        mode = "original" if self.layer_id <= 1 else "attn"
        y = GhostModuleV2(self.mid_chs, relu=True, mode=mode, dtype=self.dtype, name="ghost1")(x, train)
        if self.stride > 1:
            k, p = self.dw_kernel_size, (self.dw_kernel_size - 1) // 2
            y = nn.Conv(self.mid_chs, (k, k), strides=(self.stride,) * 2, padding=[(p, p), (p, p)],
                        feature_group_count=self.mid_chs, use_bias=False, dtype=self.dtype, name="conv_dw")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_dw")(y)
        if self.se_ratio > 0:
            s = y.mean(axis=(1, 2))
            rd = max(1, int(self.mid_chs * self.se_ratio))
            s = nn.relu(nn.Dense(rd, dtype=self.dtype, name="se_fc1")(s))
            s = jnp.clip(nn.Dense(self.mid_chs, dtype=self.dtype, name="se_fc2")(s) + 3, 0, 6) / 6
            y = y * s[:, None, None, :]
        y = GhostModuleV2(self.out_chs, relu=False, mode="original", dtype=self.dtype, name="ghost2")(y, train)
        if in_chs == self.out_chs and self.stride == 1:
            return x + y
        k, p = self.dw_kernel_size, (self.dw_kernel_size - 1) // 2
        sc = nn.Conv(in_chs, (k, k), strides=(self.stride,) * 2, padding=[(p, p), (p, p)],
                     feature_group_count=in_chs, use_bias=False, dtype=self.dtype, name="sc_dw")(x)
        sc = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="sc_bn1")(sc)
        sc = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype, name="sc_pw")(sc)
        sc = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="sc_bn2")(sc)
        return sc + y


class _Conv2dBN(nn.Module):
    c2: int
    k: int = 1
    s: int = 1
    p: int = 0
    g: int = 1
    bn_weight_init: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=[(self.p, self.p), (self.p, self.p)], feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name="c")(x)
        return nn.BatchNorm(use_running_average=not train,
                            scale_init=nn.initializers.constant(self.bn_weight_init),
                            dtype=self.dtype, name="bn")(y)


class _SqueezeExcite(nn.Module):
    rd_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rd = max(1, int(c * self.rd_ratio))
        y = x.mean(axis=(1, 2))
        y = nn.relu(nn.Dense(rd, dtype=self.dtype, name="fc1")(y))
        y = nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc2")(y))
        return x * y[:, None, None, :]


class RepVGGDW(nn.Module):
    """Depthwise RepVGG branch: dw3×3-BN + dw1×1 + identity → BN (RepViT.py:89)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        a = _Conv2dBN(c, 3, 1, 1, g=c, dtype=self.dtype, name="conv")(x, train)
        b = nn.Conv(c, (1, 1), feature_group_count=c, dtype=self.dtype, name="conv1")(x)
        return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(a + b + x)


class RepViTBlock(nn.Module):
    """RepViT token/channel mixer block (reference RepViT.py:130)."""

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
        if self.stride == 2:
            y = _Conv2dBN(inp, self.kernel_size, self.stride, (self.kernel_size - 1) // 2, g=inp,
                          dtype=self.dtype, name="tm_dw")(x, train)
            if self.use_se:
                y = _SqueezeExcite(dtype=self.dtype, name="tm_se")(y)
            y = _Conv2dBN(self.oup, 1, 1, 0, dtype=self.dtype, name="tm_pw")(y, train)
            z = _Conv2dBN(2 * self.oup, 1, 1, 0, dtype=self.dtype, name="cm_pw1")(y, train)
            z = nn.gelu(z)
            z = _Conv2dBN(self.oup, 1, 1, 0, bn_weight_init=0.0, dtype=self.dtype, name="cm_pw2")(z, train)
            return y + z
        y = RepVGGDW(dtype=self.dtype, name="tm_rep")(x, train)
        if self.use_se:
            y = _SqueezeExcite(dtype=self.dtype, name="tm_se")(y)
        z = _Conv2dBN(self.hidden_dim, 1, 1, 0, dtype=self.dtype, name="cm_pw1")(y, train)
        z = nn.gelu(z)
        z = _Conv2dBN(self.oup, 1, 1, 0, bn_weight_init=0.0, dtype=self.dtype, name="cm_pw2")(z, train)
        return y + z


class UIB(nn.Module):
    """MobileNetV4 universal inverted bottleneck (reference MobileNetv4.py):
    optional starting DW → expand PW → optional middle DW → project PW."""

    oup: int
    start_dw_kernel: int = 0
    middle_dw_kernel: int = 3
    middle_downsample: bool = False
    stride: int = 1
    expand_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]

        def conv_bn(y, c, k, s, g, name, act=True):
            p = k // 2
            y = nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)], feature_group_count=g,
                        use_bias=False, dtype=self.dtype, name=f"{name}_c")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"{name}_bn")(y)
            return nn.relu(y) if act else y

        y = x
        if self.start_dw_kernel:
            s = self.stride if not self.middle_downsample else 1
            y = conv_bn(y, inp, self.start_dw_kernel, s, inp, "start_dw", act=False)
        expand_c = int(inp * self.expand_ratio)
        y = conv_bn(y, expand_c, 1, 1, 1, "expand")
        if self.middle_dw_kernel:
            s = self.stride if self.middle_downsample else 1
            y = conv_bn(y, expand_c, self.middle_dw_kernel, s, expand_c, "middle_dw")
        y = conv_bn(y, self.oup, 1, 1, 1, "proj", act=False)
        if self.stride == 1 and inp == self.oup:
            return x + y
        return y


class GhostModuleV3(nn.Module):
    """GhostNetV3 ghost module, training (multi-branch re-param) form
    (reference GhostNetv3.py:89): primary/cheap convs are sums of 3 conv-BN
    branches + a 1×1 scale branch (k>1) + a BN skip (matching channels).
    XLA folds the branch sum at inference like the torch fuse() would."""

    oup: int
    kernel_size: int = 1
    stride: int = 1
    ratio: int = 2
    dw_size: int = 3
    relu: bool = True
    num_branches: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        init_c = math.ceil(self.oup / self.ratio)
        new_c = init_c * (self.ratio - 1)

        def conv_bn(y, c, k, s, g, name):
            p = k // 2
            y = nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)], feature_group_count=g,
                        use_bias=False, dtype=self.dtype, name=f"{name}_c")(y)
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"{name}_bn")(y)

        def rpr(y, c, k, s, g, name):
            out = sum(conv_bn(y, c, k, s, g, f"{name}_b{i}") for i in range(self.num_branches))
            if k > 1:
                out = out + conv_bn(y, c, 1, s, g if g == 1 else c, f"{name}_scale")
            if y.shape[-1] == c and s == 1:
                out = out + nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                         name=f"{name}_skip")(y)
            return out

        x1 = rpr(x, init_c, self.kernel_size, self.stride, 1, "primary")
        if self.relu:
            x1 = nn.relu(x1)
        x2 = rpr(x1, new_c, self.dw_size, 1, init_c, "cheap")
        if self.relu:
            x2 = nn.relu(x2)
        return jnp.concatenate([x1, x2], axis=-1)[..., : self.oup]


class GhostBottleneckV3(nn.Module):
    """GhostNetV3 bottleneck (reference GhostNetv3.py:479 — note the
    (in, OUT, MID) argument order, unlike V2)."""

    out_chs: int
    mid_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        y = GhostModuleV3(self.mid_chs, relu=True, dtype=self.dtype, name="ghost1")(x, train)
        if self.stride > 1:
            k, p = self.dw_kernel_size, (self.dw_kernel_size - 1) // 2
            y = nn.Conv(self.mid_chs, (k, k), strides=(self.stride,) * 2, padding=[(p, p), (p, p)],
                        feature_group_count=self.mid_chs, use_bias=False, dtype=self.dtype, name="conv_dw")(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_dw")(y)
        if self.se_ratio > 0:
            s = y.mean(axis=(1, 2))
            rd = max(1, int(self.mid_chs * self.se_ratio))
            s = nn.relu(nn.Dense(rd, dtype=self.dtype, name="se_fc1")(s))
            s = jnp.clip(nn.Dense(self.mid_chs, dtype=self.dtype, name="se_fc2")(s) + 3, 0, 6) / 6
            y = y * s[:, None, None, :]
        y = GhostModuleV3(self.out_chs, relu=False, dtype=self.dtype, name="ghost2")(y, train)
        if in_chs == self.out_chs and self.stride == 1:
            return x + y
        k, p = self.dw_kernel_size, (self.dw_kernel_size - 1) // 2
        sc = nn.Conv(in_chs, (k, k), strides=(self.stride,) * 2, padding=[(p, p), (p, p)],
                     feature_group_count=in_chs, use_bias=False, dtype=self.dtype, name="sc_dw")(x)
        sc = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="sc_bn1")(sc)
        sc = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype, name="sc_pw")(sc)
        sc = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="sc_bn2")(sc)
        return sc + y


class APConvPinwheel(nn.Module):
    """Pinwheel-shaped asymmetric-padding conv (reference APConv.py:8 PConv)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k
        # torch ZeroPad2d order (left, right, top, bottom)
        pads = [(k, 0, 1, 0), (0, k, 0, 1), (0, 1, k, 0), (1, 0, 0, k)]

        def pad(z, p):
            l, r, t, b = p
            return jnp.pad(z, ((0, 0), (t, b), (l, r), (0, 0)))

        cw = Conv(self.c2 // 4, (1, k), self.s, p=0, dtype=self.dtype, name="cw")
        ch = Conv(self.c2 // 4, (k, 1), self.s, p=0, dtype=self.dtype, name="ch")
        yw0 = cw(pad(x, pads[0]), train)
        yw1 = cw(pad(x, pads[1]), train)
        yh0 = ch(pad(x, pads[2]), train)
        yh1 = ch(pad(x, pads[3]), train)
        y = jnp.concatenate([yw0, yw1, yh0, yh1], axis=-1)
        return Conv(self.c2, 2, 1, p=0, dtype=self.dtype, name="cat")(y, train)


class TorchVision(nn.Module):
    """Backbone-from-a-zoo block (reference nn/modules/block.py:1123
    `TorchVision`): the reference loads any torchvision model, optionally
    unwraps its children and truncates the last `truncate` of them, and runs
    the remainder as a feature extractor (cfg/models/11/yolo11-cls-resnet18
    uses resnet18 with truncate=2 → the stride-32 512-channel map).

    TPU build: the trunk is a native flax implementation from
    models/backbones.py instead of a torch import. `weights` is accepted for
    YAML compatibility but ignored — pretrained torchvision checkpoints are
    not downloadable in this image; port them via utils/port.py if needed.
    truncate semantics for resnets (children = [conv1,bn1,relu,maxpool,
    layer1..4,avgpool,fc]): truncate>=2 drops avgpool+fc (feature map out),
    truncate==1 drops only fc (global-pooled NHWC 1×1 map out).
    """

    c2: int
    model: str = "resnet18"
    weights: Any = "DEFAULT"  # ignored (zero-egress image); kept for YAML parity
    unwrap: bool = True
    truncate: int = 2
    split: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...models.backbones import ResNet18Features, ResNet50

        trunks = {"resnet18": ResNet18Features, "resnet50": ResNet50}
        if self.model not in trunks:
            raise NotImplementedError(
                f"TorchVision model '{self.model}' has no native trunk yet; "
                f"available: {sorted(trunks)}"
            )
        if self.split:
            raise NotImplementedError("TorchVision split=True is not supported")
        feats = trunks[self.model](dtype=self.dtype, name="m")(x, train)
        y = feats["layer4"]
        if self.unwrap and self.truncate == 1:
            y = y.mean(axis=(1, 2), keepdims=True)  # avgpool kept, fc dropped
        return y
