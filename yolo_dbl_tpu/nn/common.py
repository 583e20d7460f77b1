"""Base convolution modules (NHWC, flax.linen).

TPU-native equivalents of the reference's nn/modules/conv.py primitives
(Conv at conv.py:39, DWConv, DSConv at conv.py:91, Concat). Design notes:

- NHWC layout throughout: channels-last is the native TPU conv layout, so
  XLA tiles directly onto the MXU without transposes.
- Explicit torch-style symmetric padding (autopad) rather than SAME, so
  spatial alignment matches the reference for stride-2 convs.
- BatchNorm uses the reference's hyperparameters (eps=1e-3, momentum=0.03,
  set by ultralytics utils/torch_utils.py initialize_weights); flax momentum
  is 1 - torch momentum. Conv+BN fusion is left to XLA (no manual fuse pass).
- Mixed precision: modules carry `dtype` (compute) and keep params fp32;
  pass dtype=jnp.bfloat16 for TPU inference/training.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

BN_MOMENTUM = 0.97  # flax momentum = 1 - torch 0.03
BN_EPS = 1e-3


def autopad(k, p=None, d=1):
    """'Same'-shape padding for torch-style symmetric padding (conv.py:30)."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


# Global default activation, overridable by a model YAML's `activation:` key
# (reference tasks.py:965 `Conv.default_act = eval(act)`). A one-slot stack so
# YOLOModel can scope the override to its own trace.
_DEFAULT_ACT = [nn.silu]

_ACT_NAMES = {
    "nn.SiLU()": nn.silu,
    "nn.ReLU()": nn.relu,
    "nn.ReLU6()": lambda x: jnp.clip(nn.relu(x), 0.0, 6.0),
    "nn.LeakyReLU()": lambda x: nn.leaky_relu(x, 0.01),
    "nn.LeakyReLU(0.1)": lambda x: nn.leaky_relu(x, 0.1),
    "nn.GELU()": nn.gelu,
    "nn.Hardswish()": lambda x: x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0,
    "nn.Mish()": lambda x: x * jnp.tanh(nn.softplus(x)),
    "nn.Identity()": lambda x: x,
}


def resolve_act(name: str) -> Callable:
    """Map a torch-style activation string from YAML to a jax function."""
    if name not in _ACT_NAMES:
        raise ValueError(f"unsupported activation '{name}'; known: {sorted(_ACT_NAMES)}")
    return _ACT_NAMES[name]


def default_act() -> Callable:
    return _DEFAULT_ACT[-1]


@contextmanager
def default_act_ctx(fn: Optional[Callable]):
    """Scope a default-activation override to one model trace."""
    if fn is None:
        yield
        return
    _DEFAULT_ACT.append(fn)
    try:
        yield
    finally:
        _DEFAULT_ACT.pop()


# concat-fold policy: `conv1x1(concat(parts))` rewritten as a sum of
# kernel-slice matmuls so the concat tensor never reaches HBM. Isolated
# micro-benchmarks on the v5e favored the fold (tools/exp_concat_fold.py,
# b128 bf16 slope: 40x40 4x256 2.81->2.38 ms, 20x20 2x512 0.36->0.22,
# mixed 256+256+512 3.22->1.92; 80x80 4x128 LOSES 6.69->7.30), but the
# full-graph A/B on the chip was NEGATIVE: flagship b128 scan 1112.5 ->
# 1091.0 img/s, u8 lane 1076.7 -> 1061.4 (PROFILE.md "Concat-fold A/B").
# In context XLA already fuses the concat into the producing ops, while
# the hand-split form pins a partial-sum chain it can't re-fuse. Default
# is therefore OFF everywhere; YOLO_DBL_FOLD_CONCAT=1 opts in (exactness
# pinned by tests/test_concat_fold.py regardless of backend).
_FOLD_MAXHW_DEFAULT = 40 * 40


def fold_concat_enabled() -> bool:
    return os.environ.get("YOLO_DBL_FOLD_CONCAT", "") not in ("0", "false", "")


def fold_concat_maxhw() -> int:
    return int(os.environ.get("YOLO_DBL_FOLD_CONCAT_MAXHW", _FOLD_MAXHW_DEFAULT))


def _pad_spec(p):
    """Torch-style symmetric padding → flax per-dim (lo, hi) pairs."""
    if isinstance(p, int):
        return [(p, p), (p, p)]
    ph, pw = p
    return [(ph, ph), (pw, pw)]


class Conv(nn.Module):
    """Conv2d + BatchNorm + SiLU (reference conv.py:39), NHWC.

    Args mirror the reference: c2 out-channels, k kernel, s stride, p padding
    (None = autopad), g groups, d dilation, act True→SiLU / False→identity.
    """

    c2: int
    k: Union[int, Sequence[int]] = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, Callable] = True
    dtype: Dtype = jnp.float32

    def setup(self):
        # setup-style (not @nn.compact) so the fused-stem path can invoke
        # norm_act() on the bound module — variable tree is unchanged
        # (attribute names 'conv'/'bn' are the scope names)
        self.conv = nn.Conv(
            features=self.c2,
            kernel_size=_pair(self.k),
            strides=_pair(self.s),
            padding=_pad_spec(autopad(self.k, self.p, self.d)),
            feature_group_count=self.g,
            kernel_dilation=_pair(self.d),
            use_bias=False,
            dtype=self.dtype,
        )
        self.bn = nn.BatchNorm(
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
        )

    def __call__(self, x, train: bool = False):
        return self.norm_act(self.conv(x), train)

    def call_parts(self, parts, train: bool = False):
        """`self(concat(parts, -1), train)` without materializing the concat.

        A 1x1 conv over a channel-concat equals the sum of matmuls with the
        kernel sliced along the input-channel axis — exact linear algebra
        (bf16 partial-sum order is the only drift), identical param tree.
        OFF by default (the full-graph A/B on the v5e was negative — see
        the policy note above); YOLO_DBL_FOLD_CONCAT=1 opts in, and even
        then non-1x1/strided/grouped convs, maps above the spatial
        threshold, and init fall back to the concat form.
        """
        if len(parts) == 1:
            return self(parts[0], train)
        h, w = parts[0].shape[1:3]
        if (
            self.is_initializing()
            or _pair(self.k) != (1, 1)
            or _pair(self.s) != (1, 1)
            or self.g != 1
            or self.d != 1
            # explicit nonzero padding would be dropped by the matmul form
            or autopad(self.k, self.p, self.d) not in (0, (0, 0))
            or h * w > fold_concat_maxhw()
            or not fold_concat_enabled()
        ):
            return self(jnp.concatenate(parts, -1), train)
        kernel = self.conv.variables["params"]["kernel"][0, 0]  # (cin, cout)
        kernel = kernel.astype(self.dtype)
        total = sum(p.shape[-1] for p in parts)
        if total != kernel.shape[0]:
            raise ValueError(
                f"call_parts channel mismatch: parts sum to {total}, kernel "
                f"expects {kernel.shape[0]}")
        y = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            part = p.astype(self.dtype) @ kernel[off : off + c]
            y = part if y is None else y + part
            off += c
        return self.norm_act(y, train)

    def norm_act(self, x, train: bool = False, phase_groups: int = 1):
        """BatchNorm + activation only — the tail of __call__.

        phase_groups > 1: `x`'s channel dim is `phase_groups` space-to-depth
        phases of the same c2 channels (phase-major, ops/fused_stem.py); BN
        statistics must aggregate over the phases to match the un-fused conv,
        so the phases are folded into a spatial dim around the BN call.
        """
        if phase_groups > 1:
            b, h, w, pc = x.shape
            x = x.reshape(b, h, w * phase_groups, pc // phase_groups)
        x = self.bn(x, use_running_average=not train)
        if self.act is True:
            x = default_act()(x)
        elif callable(self.act):
            x = self.act(x)
        if phase_groups > 1:
            x = x.reshape(b, h, w, pc)
        return x


class ConvTranspose2d(nn.Module):
    """Plain transposed conv with torch nn.ConvTranspose2d semantics
    (out = (in-1)*s - 2p + k), used by the v6 head's upsample path
    (reference cfg/models/v6/yolov6.yaml:34, registered at tasks.py:1007).
    Bias, no BN/act — it is the raw torch layer, not ultralytics ConvTranspose.
    """

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.ConvTranspose(
            features=self.c2,
            kernel_size=_pair(self.k),
            strides=_pair(self.s),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        # crop flax's VALID output to the torch formula (in-1)*s - 2p + k
        oh = (x.shape[1] - 1) * self.s + self.k - 2 * self.p
        ow = (x.shape[2] - 1) * self.s + self.k - 2 * self.p
        return y[:, self.p:self.p + oh, self.p:self.p + ow, :]


class DWConv(nn.Module):
    """Depthwise conv: Conv with g = gcd(c1, c2) (reference conv.py DWConv).

    Params are named conv/bn directly (no nested wrapper level) so torch
    state_dict paths like `cv3.0.0.0.conv.weight` port 1:1 (utils/port.py).
    """

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: Union[bool, Callable] = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        k = _pair(self.k)
        p = autopad(self.k, None, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=k,
            strides=_pair(self.s),
            padding=_pad_spec(p),
            feature_group_count=math.gcd(c1, self.c2),
            kernel_dilation=_pair(self.d),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is True:
            x = default_act()(x)
        elif callable(self.act):
            x = self.act(x)
        return x


class DSConv(nn.Module):
    """Depthwise-separable conv: DW k×k → PW 1×1 → BN → SiLU (conv.py:91).

    Note the reference applies BN only once, after the pointwise conv.
    """

    c2: int
    k: int = 3
    s: int = 1
    p: Optional[int] = None
    d: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        p = self.p if self.p is not None else (self.d * (self.k - 1)) // 2
        x = nn.Conv(
            features=c1,
            kernel_size=_pair(self.k),
            strides=_pair(self.s),
            padding=[(p, p), (p, p)],
            feature_group_count=c1,
            kernel_dilation=_pair(self.d),
            use_bias=False,
            dtype=self.dtype,
            name="dw",
        )(x)
        x = nn.Conv(features=self.c2, kernel_size=(1, 1), use_bias=False, dtype=self.dtype, name="pw")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.silu(x)


class Conv2d(nn.Module):
    """Bare torch-style conv (bias, no BN/act) for heads and raw projections."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = autopad(self.k, self.p, self.d)
        return nn.Conv(
            features=self.c2,
            kernel_size=_pair(self.k),
            strides=_pair(self.s),
            padding=_pad_spec(p),
            feature_group_count=self.g,
            kernel_dilation=_pair(self.d),
            use_bias=self.bias,
            dtype=self.dtype,
            name="conv",
        )(x)


def concat(xs, axis=-1):
    """Channel concat for NHWC (reference Concat module, dim=1 in NCHW)."""
    return jnp.concatenate(xs, axis=axis)
