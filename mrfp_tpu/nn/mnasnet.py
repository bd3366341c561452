"""MNASNet 0.5 / 1.0 backbone — the zoo's mnasnet trunks
(network/deepv3.py:210-257 group torchvision mnasnet layers into the
DeepLab stage layout: stem = layers[0:8], stages = [8:10]/[10:12]/[12:14]/
[14:17]).

Torchvision structure: conv32-s2 + dw16 stem, six inverted-residual stacks
(kernel 3/5/5/3/5/3, strides 2/2/2/1/2/1, expansions 3/3/6/6/6/6, repeats
3/3/3/2/4/1), then a 1x1 conv to 1280. Depths scale by alpha rounded to
multiples of 8. Dilation surgery mirrors the zoo rule: only originally
stride-2 convs become stride-1 dilated (deepv3.py:243-257 filters on
m.stride == (2,2)).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mrfp_tpu.nn.layers import conv2d
from mrfp_tpu.nn.norms import BatchNorm

# (kernel, stride, expansion, repeats, base_out)
_STACKS = ((3, 2, 3, 3, 24), (5, 2, 3, 3, 40), (5, 2, 6, 3, 80),
           (3, 1, 6, 2, 96), (5, 2, 6, 4, 192), (3, 1, 6, 1, 320))
_BN_MOM = 1 - 0.9997  # torchvision MNASNet BN momentum


def _round8(v: float) -> int:
    new_v = max(8, int(v + 4) // 8 * 8)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = conv2d(self.features, self.kernel, self.stride, pad, self.dilation,
                   groups=self.groups, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(self.features, momentum=_BN_MOM, name="bn")(x, train)
        return nn.relu(x) if self.relu else x


class _InvertedResidual(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    expansion: int = 3
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        mid = inp * self.expansion
        res = self.stride == 1 and self.dilation == 1 and inp == self.features
        out = _ConvBNReLU(mid, 1, dtype=self.dtype, name="pw")(x, train)
        out = _ConvBNReLU(mid, self.kernel, self.stride, self.dilation,
                          groups=mid, dtype=self.dtype, name="dw")(out, train)
        out = _ConvBNReLU(self.features, 1, relu=False, dtype=self.dtype,
                          name="pw_linear")(out, train)
        return x + out if res else out


class MNASNet(nn.Module):
    alpha: float = 1.0
    variant: str = "D16"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.variant == "D":
            grp_dil = {1: 2, 2: 4}   # zoo layer2/layer3 groups
        elif self.variant == "D16":
            grp_dil = {2: 2}
        else:
            grp_dil = {}
        d = [_round8(c * self.alpha) for c in (32, 16)] + \
            [_round8(s[4] * self.alpha) for s in _STACKS]
        self._d = d
        # stem: conv32 s2, dw, pw-linear 16
        self.stem_conv = _ConvBNReLU(d[0], 3, 2, dtype=self.dtype, name="stem_conv")
        self.stem_dw = _ConvBNReLU(d[0], 3, 1, groups=d[0], dtype=self.dtype,
                                   name="stem_dw")
        self.stem_pw = _ConvBNReLU(d[1], 1, relu=False, dtype=self.dtype,
                                   name="stem_pw")
        stacks = []
        # stack index -> stage group (zoo: [0,1] -> stage0, [2,3] -> stage1,
        # [4,5] -> stage2)
        for si, (k, s, e, n, _c) in enumerate(_STACKS):
            stage = si // 2
            dil = grp_dil.get(stage, 1)
            blocks = []
            for i in range(n):
                stride = s if i == 0 else 1
                if stride == 2 and dil > 1:
                    stride, bd = 1, dil
                else:
                    bd = 1
                blocks.append(_InvertedResidual(
                    d[2 + si], k, stride, e, dilation=bd, dtype=self.dtype,
                    name=f"stack{si}_block{i}"))
            stacks.append(blocks)
        self._stacks = stacks
        self.head = _ConvBNReLU(1280, 1, dtype=self.dtype, name="head")
        self.stage_channels = (d[3], d[5], d[7], 1280)
        self.stem_channels = d[1]

    def stem(self, x, w_arr: list, train: bool):
        x = self.stem_conv(x, train)
        x = self.stem_dw(x, train)
        return self.stem_pw(x, train)

    def stage(self, i: int, x, w_arr: list, train: bool):
        if i < 3:
            for blocks in self._stacks[2 * i:2 * i + 2]:
                for blk in blocks:
                    x = blk(x, train)
            return x
        return self.head(x, train)

    def __call__(self, x, train: bool = False):
        w_arr: list = []
        x = self.stem(x, w_arr, train)
        feats = {"stem": x}
        for i in range(4):
            x = self.stage(i, x, w_arr, train)
            feats[f"layer{i + 1}"] = x
        feats["w_arr"] = w_arr
        return feats


def mnasnet0_5(**kw) -> MNASNet:
    return MNASNet(alpha=0.5, **kw)


def mnasnet1_0(**kw) -> MNASNet:
    return MNASNet(alpha=1.0, **kw)
