"""SE-ResNeXt / SENet backbone family (network/SEresnext.py), NHWC.

Pure-zoo component (no factory references it, SURVEY.md §2.2 #31) kept for
capability parity. Provides SENet-154, SE-ResNet-50/101/152 and
SE-ResNeXt-50/101 via the same parameterization as the reference SENet
(block kind, groups, reduction, inplanes, input_3x3, downsample kernel).
The Caffe-compatibility ceil_mode max-pool (SEresnext.py:330-333) is
reproduced with explicit asymmetric padding.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrfp_tpu.nn.layers import avg_pool_global, conv2d
from mrfp_tpu.nn.norms import BatchNorm


def max_pool_ceil(x, window: int = 3, stride: int = 2):
    """torch MaxPool2d(window, stride, ceil_mode=True): pad bottom/right so
    partial windows count."""
    h, w = x.shape[1], x.shape[2]
    oh = -(-(h - window) // stride) + 1
    ow = -(-(w - window) // stride) + 1
    ph = max((oh - 1) * stride + window - h, 0)
    pw = max((ow - 1) * stride + window - w, 0)
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=[(0, ph), (0, pw)])


class SEModule(nn.Module):
    """Squeeze-Excitation (SEresnext.py:70-91)."""

    channels: int
    reduction: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = avg_pool_global(x)
        s = conv2d(self.channels // self.reduction, 1, bias=True,
                   dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = conv2d(self.channels, 1, bias=True, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class SEBottleneckBlock(nn.Module):
    """The three SE bottleneck variants, selected by ``kind``:
    'senet' (SEBottleneck), 'seresnet' (stride on conv1), 'seresnext'
    (grouped width, SEresnext.py:94-193)."""

    planes: int
    kind: str = "seresnext"
    groups: int = 32
    reduction: int = 16
    stride: int = 1
    downsample_kernel: int = 1
    downsample_pad: int = 0
    has_downsample: bool = False
    base_width: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.planes * 4
        if self.kind == "senet":
            w1, w2 = self.planes * 2, self.planes * 4
            s1, s2 = 1, self.stride
        elif self.kind == "seresnet":
            w1 = w2 = self.planes
            s1, s2 = self.stride, 1
        else:  # seresnext
            w1 = w2 = math.floor(self.planes * (self.base_width / 64)) * self.groups
            s1, s2 = 1, self.stride

        out = conv2d(w1, 1, s1, 0, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(w1, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv2d(w2, 3, s2, 1, groups=self.groups, dtype=self.dtype,
                     name="conv2")(out)
        out = BatchNorm(w2, name="bn2")(out, train)
        out = nn.relu(out)
        out = conv2d(out_ch, 1, 1, 0, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(out_ch, name="bn3")(out, train)
        residual = x
        if self.has_downsample:
            residual = conv2d(out_ch, self.downsample_kernel, self.stride,
                              self.downsample_pad, dtype=self.dtype,
                              name="downsample_conv")(x)
            residual = BatchNorm(out_ch, name="downsample_bn")(residual, train)
        out = SEModule(out_ch, self.reduction, dtype=self.dtype,
                       name="se_module")(out) + residual
        return nn.relu(out)


class SENet(nn.Module):
    """SENet trunk with the reference layer0/stage layout
    (SEresnext.py:194-363)."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    kind: str = "seresnext"
    groups: int = 32
    reduction: int = 16
    inplanes: int = 64
    input_3x3: bool = False
    downsample_kernel: int = 1
    downsample_pad: int = 0
    base_width: int = 4
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        stages = []
        in_ch = self.inplanes
        for i, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            blks = []
            for b in range(blocks):
                stride = 1 if (i == 0 or b > 0) else 2
                # layer1 uses 1x1/pad0 downsample regardless (SEresnext.py:276-283)
                dk = 1 if i == 0 else self.downsample_kernel
                dp = 0 if i == 0 else self.downsample_pad
                blks.append(SEBottleneckBlock(
                    planes=planes, kind=self.kind, groups=self.groups,
                    reduction=self.reduction, stride=stride,
                    downsample_kernel=dk, downsample_pad=dp,
                    has_downsample=(b == 0 and (stride != 1 or in_ch != planes * 4)),
                    base_width=self.base_width, dtype=self.dtype,
                    name=f"layer{i + 1}_block{b}"))
                in_ch = planes * 4
            stages.append(blks)
        self._stages = stages
        self.stage_channels = (256, 512, 1024, 2048)

    @nn.compact
    def _stem(self, x, train: bool):
        if self.input_3x3:
            x = conv2d(64, 3, 2, 1, dtype=self.dtype, name="stem_conv1")(x)
            x = nn.relu(BatchNorm(64, name="stem_bn1")(x, train))
            x = conv2d(64, 3, 1, 1, dtype=self.dtype, name="stem_conv2")(x)
            x = nn.relu(BatchNorm(64, name="stem_bn2")(x, train))
            x = conv2d(self.inplanes, 3, 1, 1, dtype=self.dtype,
                       name="stem_conv3")(x)
            x = nn.relu(BatchNorm(self.inplanes, name="stem_bn3")(x, train))
        else:
            x = conv2d(self.inplanes, 7, 2, 3, dtype=self.dtype,
                       name="stem_conv1")(x)
            x = nn.relu(BatchNorm(self.inplanes, name="stem_bn1")(x, train))
        return max_pool_ceil(x)

    def stem(self, x, w_arr: list, train: bool):
        return self._stem(x, train)

    def stage(self, i: int, x, w_arr: list, train: bool):
        for blk in self._stages[i]:
            x = blk(x, train)
        return x

    def __call__(self, x, train: bool = False):
        w_arr: list = []
        x = self.stem(x, w_arr, train)
        feats = {"stem": x}
        for i in range(4):
            x = self.stage(i, x, w_arr, train)
            feats[f"layer{i + 1}"] = x
        feats["w_arr"] = w_arr
        return feats


def se_resnext50_32x4d(**kw) -> SENet:
    return SENet(layers=(3, 4, 6, 3), kind="seresnext", groups=32, **kw)


def se_resnext101_32x4d(**kw) -> SENet:
    return SENet(layers=(3, 4, 23, 3), kind="seresnext", groups=32, **kw)


def senet154(**kw) -> SENet:
    return SENet(layers=(3, 8, 36, 3), kind="senet", groups=64,
                 inplanes=128, input_3x3=True, downsample_kernel=3,
                 downsample_pad=1, **kw)
