"""GiraffeNeckV2 FPN (NHWC, flax.linen).

Reference parity (nn/structures/GiraffeFPN/): GiraffeNeckV2
(giraffe_fpn_btn.py:7) over ops.py blocks — ConvBNAct (:76), RepConv
(:499, training form: 3×3 + 1×1 + identity BN branches; XLA folds the sum
at inference where torch re-parameterizes by hand), BasicBlock_3x3_Reverse
(:274), CSPStage (:432), SPP (:401). Queen-fusion topology: log2n bottom-up
+ top-down cross-scale merges producing (P3, P4, P5).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resample import max_pool, nearest_upsample

Dtype = Any


def _act(name: str):
    return {"silu": nn.silu, "swish": nn.silu, "relu": nn.relu, "lrelu": lambda x: nn.leaky_relu(x, 0.1)}[name]


class ConvBNAct(nn.Module):
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.k - 1) // 2
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s), padding=[(p, p), (p, p)],
                    feature_group_count=self.g, use_bias=False, dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(y)
        return _act(self.act)(y)


class RepConvG(nn.Module):
    """RepVGG-style 3×3 + 1×1 + identity-BN (reference ops.py:499, train form)."""

    c2: int
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]

        def branch(k, p, name):
            y = nn.Conv(self.c2, (k, k), padding=[(p, p), (p, p)], use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(x)
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"{name}_bn")(y)

        y = branch(3, 1, "dense") + branch(1, 0, "pw")
        if c1 == self.c2:
            y = y + nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="id_bn")(x)
        return _act(self.act)(y)


class BasicBlock3x3Reverse(nn.Module):
    """RepConv(expand) → 3×3 ConvBNAct, residual (reference ops.py:274)."""

    hidden_ratio: float
    c2: int
    act: str = "silu"
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(x.shape[-1] * self.hidden_ratio)
        y = RepConvG(hidden, act=self.act, dtype=self.dtype, name="conv2")(x, train)
        y = ConvBNAct(self.c2, 3, act=self.act, dtype=self.dtype, name="conv1")(y, train)
        return x + y if self.shortcut else y


class CSPStage(nn.Module):
    """CSP stage with dense intermediate concat (reference ops.py:432)."""

    hidden_ratio: float
    c2: int
    n: int
    act: str = "silu"
    spp: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch_first = self.c2 // 2
        ch_mid = self.c2 - ch_first
        y1 = ConvBNAct(ch_first, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        y2 = ConvBNAct(ch_mid, 1, act=self.act, dtype=self.dtype, name="conv2")(x, train)
        mids = [y1]
        for i in range(self.n):
            y2 = BasicBlock3x3Reverse(self.hidden_ratio, ch_mid, act=self.act,
                                      dtype=self.dtype, name=f"blk{i}")(y2, train)
            mids.append(y2)
            if i == (self.n - 1) // 2 and self.spp:
                pools = [y2] + [max_pool(y2, k, 1, k // 2) for k in (5, 9, 13)]
                y2 = ConvBNAct(ch_mid, 1, act=self.act, dtype=self.dtype, name="spp")(
                    jnp.concatenate(pools, -1), train
                )
        return ConvBNAct(self.c2, 1, act=self.act, dtype=self.dtype, name="conv3")(
            jnp.concatenate(mids, -1), train
        )


class GiraffeNeckV2(nn.Module):
    """Queen-fusion neck (reference giraffe_fpn_btn.py:7). Input [P3, P4, P5]
    (the reference's [x2, x1, x0]); output (P3', P4', P5')."""

    in_channels: Tuple[int, int, int]
    out_channels: Tuple[int, int, int] = (256, 512, 1024)
    depth: float = 1.0
    hidden_ratio: float = 1.0
    act: str = "silu"
    spp: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        x2, x1, x0 = xs  # P3, P4, P5
        ic, oc = self.in_channels, self.out_channels
        n = max(round(3 * self.depth), 1)
        kw = dict(act=self.act, spp=self.spp, dtype=self.dtype)

        x13 = ConvBNAct(ic[1], 3, 2, act=self.act, dtype=self.dtype, name="bu_conv13")(x1, train)
        x3 = CSPStage(self.hidden_ratio, ic[2], n, name="merge_3", **kw)(
            jnp.concatenate([x0, x13], -1), train
        )

        x34 = nearest_upsample(x3, 2)
        x24 = ConvBNAct(ic[0], 3, 2, act=self.act, dtype=self.dtype, name="bu_conv24")(x2, train)
        x4 = CSPStage(self.hidden_ratio, ic[1], n, name="merge_4", **kw)(
            jnp.concatenate([x1, x24, x34], -1), train
        )

        x45 = nearest_upsample(x4, 2)
        x5 = CSPStage(self.hidden_ratio, oc[0], n, name="merge_5", **kw)(
            jnp.concatenate([x2, x45], -1), train
        )

        x57 = ConvBNAct(oc[0], 3, 2, act=self.act, dtype=self.dtype, name="bu_conv57")(x5, train)
        x7 = CSPStage(self.hidden_ratio, oc[1], n, name="merge_7", **kw)(
            jnp.concatenate([x4, x57], -1), train
        )

        x46 = ConvBNAct(ic[1], 3, 2, act=self.act, dtype=self.dtype, name="bu_conv46")(x4, train)
        x76 = ConvBNAct(oc[1], 3, 2, act=self.act, dtype=self.dtype, name="bu_conv76")(x7, train)
        x6 = CSPStage(self.hidden_ratio, oc[2], n, name="merge_6", **kw)(
            jnp.concatenate([x3, x46, x76], -1), train
        )
        return (x5, x7, x6)
