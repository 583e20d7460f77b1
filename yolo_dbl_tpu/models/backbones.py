"""Classification backbones for the classical detector zoo (NHWC, flax).

Equivalents of the torchvision backbones the reference builds on:
ResNet-50 (models/Fast-RCNN/model.py:12, models/RCNN/model.py, SSD
backbone.py:13) and VGG16 (torchvision ssd300_vgg16, models/SSD/run.py:22).
No pretrained weights are available in this image (zero egress) — models
initialize randomly; the harness trains from scratch like the reference
does when weights are absent.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resample import max_pool, nearest_upsample

Dtype = Any


class ResNetBottleneck(nn.Module):
    """torchvision Bottleneck: 1×1 → 3×3(stride) → 1×1(×4) + projection."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv_bn(y, c, k, s, name, p=0):
            y = nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)], use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(y)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=f"{name}_bn")(y)

        identity = x
        y = nn.relu(conv_bn(x, self.planes, 1, 1, "c1"))
        y = nn.relu(conv_bn(y, self.planes, 3, self.stride, "c2", p=1))
        y = conv_bn(y, self.planes * 4, 1, 1, "c3")
        if self.downsample:
            identity = conv_bn(x, self.planes * 4, 1, self.stride, "down")
        return nn.relu(y + identity)


class ResNetBasicBlock(nn.Module):
    """torchvision BasicBlock: 3×3(stride) → 3×3 + projection (resnet18/34)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv_bn(y, c, k, s, name, p=0):
            y = nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)], use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(y)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=f"{name}_bn")(y)

        identity = x
        y = nn.relu(conv_bn(x, self.planes, 3, self.stride, "c1", p=1))
        y = conv_bn(y, self.planes, 3, 1, "c2", p=1)
        if self.downsample:
            identity = conv_bn(x, self.planes, 1, self.stride, "down")
        return nn.relu(y + identity)


class ResNet18Features(nn.Module):
    """ResNet-18 trunk returning {layer1..layer4} feature maps (NHWC).

    Strides 4/8/16/32, channels 64/128/256/512 — matching torchvision
    resnet18 (the backbone the reference's TorchVision module loads in
    cfg/models/11/yolo11-cls-resnet18.yaml)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = max_pool(y, 3, 2, 1)
        feats = {}
        for li, (planes, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            for bi in range(2):
                y = ResNetBasicBlock(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0 and li > 1,
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(y, train)
            feats[f"layer{li}"] = y
        return feats


class ResNet50(nn.Module):
    """ResNet-50 trunk returning {layer1..layer4} feature maps (NHWC).

    Strides 4/8/16/32, channels 256/512/1024/2048 — matching torchvision
    resnet50 used throughout the reference zoo.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = max_pool(y, 3, 2, 1)
        feats = {}
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1
        ):
            for bi in range(blocks):
                y = ResNetBottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(y, train)
            feats[f"layer{li}"] = y
        return feats


class FPN(nn.Module):
    """Feature pyramid on ResNet C2–C5 → P2–P5 (+P6 pool), 256 channels.

    Equivalent of torchvision resnet_fpn_backbone (reference Fast-RCNN
    model.py:47, Faster-RCNN via torchvision detection models).
    """

    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        names = ["layer1", "layer2", "layer3", "layer4"]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(feats[n])
            for i, n in enumerate(names)
        ]
        outs = [None] * 4
        outs[3] = laterals[3]
        for i in (2, 1, 0):
            outs[i] = laterals[i] + nearest_upsample(outs[i + 1], 2)[:, : laterals[i].shape[1], : laterals[i].shape[2]]
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"smooth{i}")(o)
            for i, o in enumerate(outs)
        ]
        return outs  # P2, P3, P4, P5


class VGG16Features(nn.Module):
    """VGG16 conv trunk for SSD300 (torchvision ssd300_vgg16 backbone):
    conv4_3 tap (512ch, 38×38 at 300) then fc-conv block to conv7 (1024ch)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "C", 512, 512, 512]
        y = x
        idx = 0
        for v in cfg:
            if v == "M":
                y = max_pool(y, 2, 2, 0)
            elif v == "C":  # ceil_mode pool
                pad_h = y.shape[1] % 2
                pad_w = y.shape[2] % 2
                y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), constant_values=-jnp.inf)
                y = max_pool(y, 2, 2, 0)
            else:
                y = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"conv{idx}")(y)
                y = nn.relu(y)
                idx += 1
        conv4_3 = y  # (B, 38, 38, 512) at 300 input
        y = max_pool(y, 2, 2, 0)
        for v in (512, 512, 512):
            y = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=f"conv{idx}")(y)
            y = nn.relu(y)
            idx += 1
        y = max_pool(y, 3, 1, 1)
        # fc6/fc7 as dilated convs (SSD paper)
        y = nn.Conv(1024, (3, 3), padding=[(6, 6), (6, 6)], kernel_dilation=(6, 6),
                    dtype=self.dtype, name="fc6")(y)
        y = nn.relu(y)
        y = nn.Conv(1024, (1, 1), dtype=self.dtype, name="fc7")(y)
        conv7 = nn.relu(y)  # (B, 19, 19, 1024)
        return conv4_3, conv7


class L2Norm(nn.Module):
    """SSD conv4_3 L2 normalization with learnable per-channel scale (init 20)."""

    scale_init: float = 20.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.param("weight", nn.initializers.constant(self.scale_init), (c,))
        norm = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(-1, keepdims=True) + 1e-10)
        return (x / norm * g.astype(x.dtype)).astype(x.dtype)


class SSDExtraVGG(nn.Module):
    """SSD300 extra feature layers after conv7 (torchvision _extra_block chain):
    1024→(256,512 s2)→(128,256 s2)→(128,256 k3)→(128,256 k3)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        outs = []
        specs = [
            (256, 512, 2, 1),
            (128, 256, 2, 1),
            (128, 256, 1, 0),
            (128, 256, 1, 0),
        ]
        y = x
        for i, (mid, out, s, p) in enumerate(specs):
            y = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype, name=f"extra{i}_1")(y))
            y = nn.relu(
                nn.Conv(out, (3, 3), strides=(s, s), padding=[(p, p), (p, p)],
                        dtype=self.dtype, name=f"extra{i}_2")(y)
            )
            outs.append(y)
        return outs


class SSDResNetBackbone(nn.Module):
    """SSD ResNet-50 backbone (reference models/SSD/backbone.py:5): layer2 and
    layer3 taps + 4 extra conv stages from layer3."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        feats = ResNet50(dtype=self.dtype, name="resnet")(x, train)
        outs = [feats["layer2"], feats["layer3"]]
        specs = [
            (256, 512, 2, 1, 3),
            (128, 256, 2, 1, 3),
            (128, 256, 1, 0, 3),
            (128, 256, 1, 0, 3),
        ]
        y = feats["layer3"]
        for i, (mid, out, s, p, k) in enumerate(specs):
            y = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype, name=f"extra{i}_1")(y))
            y = nn.relu(
                nn.Conv(out, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        dtype=self.dtype, name=f"extra{i}_2")(y)
            )
            outs.append(y)
        return outs
