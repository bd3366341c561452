"""MobileNetV2 backbone (network/Mobilenet.py), NHWC / ReLU6.

iw instrumentation follows the reference placement: inverted-residual blocks
number 1, 6, 10, 17 (1-based over the IR blocks) receive wt_layer[2..5]
(Mobilenet.py:230-240; the listed slot 18 is never honored upstream because
the final ConvBNReLU is built without an iw argument — we keep wt_layer[6]
wired to it, which is the evident intent).

Stage grouping matches the zoo wiring (network/deepv3.py:259-287):
stem = features[0:2], stages = features[2:7] / [7:11] / [11:18] / [18:].
Dilation surgery: only the convs that originally had stride 2 become
stride-1 dilated (network/deepv3.py:288-298 filters on m.stride==(2,2)).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrfp_tpu.nn.layers import conv2d
from mrfp_tpu.nn.norms import BatchNorm, apply_iw, make_iw_layer


def _make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class ConvBNReLU6(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = conv2d(self.features, self.kernel_size, self.stride, pad,
                   self.dilation, groups=self.groups, dtype=self.dtype,
                   name="conv")(x)
        x = BatchNorm(self.features, name="bn")(x, train)
        return relu6(x)


class InvertedResidual(nn.Module):
    """MobileNetV2 block (Mobilenet.py:95-174): optional pw expand, dw 3x3,
    pw-linear; residual when stride 1 and channels match; iw layer after."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    in_features: int = 0
    iw: int = 0
    dilation: int = 1     # applied to the dw conv when the stride-2 surgery hits
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w_arr: list, train: bool):
        inp = self.in_features or x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and self.dilation == 1 and inp == self.features
        out = x
        if self.expand_ratio != 1:
            out = ConvBNReLU6(hidden, 1, dtype=self.dtype, name="expand")(out, train)
        out = ConvBNReLU6(hidden, 3, self.stride, groups=hidden,
                          dilation=self.dilation, dtype=self.dtype,
                          name="dw")(out, train)
        out = conv2d(self.features, 1, 1, 0, dtype=self.dtype,
                     name="project")(out)
        out = BatchNorm(self.features, name="project_bn")(out, train)
        if use_res:
            out = x + out
        layer = make_iw_layer(self.iw, self.features, "instance_norm_layer")
        return apply_iw(layer, self.iw, out, w_arr, train)


# (t, c, n, s) — Mobilenet.py:210-218
_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
_IW_FEATURES = {1: 2, 6: 3, 10: 4, 17: 5}  # IR index -> wt_layer slot


class MobileNetV2(nn.Module):
    wt_layer: Tuple[int, ...] = (0,) * 7
    variant: str = "D16"
    width_mult: float = 1.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        # group dilation per the zoo surgery (network/deepv3.py:288-298):
        # D: layer2 grp dil 2, layer3 grp dil 4; D16: layer3 grp dil 2
        if self.variant == "D":
            grp_dil = {2: 2, 3: 4}
        elif self.variant == "D16":
            grp_dil = {3: 2}
        else:
            grp_dil = {}

        input_ch = _make_divisible(32 * self.width_mult)
        self.last_channel = _make_divisible(1280 * max(1.0, self.width_mult))
        feats: List = [ConvBNReLU6(input_ch, 3, 2, dtype=self.dtype, name="feat0")]
        count = 0
        feat_idx = 1
        # feature index -> stage group (zoo: stem=[0:2], stages [2:7],
        # [7:11], [11:18], [18:])
        groups = {"stem": [0], 0: [], 1: [], 2: [], 3: []}
        for t, c, n, s in _SETTINGS:
            out_ch = _make_divisible(c * self.width_mult)
            for i in range(n):
                count += 1
                iw = self.wt_layer[_IW_FEATURES[count]] if count in _IW_FEATURES else 0
                stride = s if i == 0 else 1
                stage = ("stem" if feat_idx < 2 else
                         0 if feat_idx < 7 else 1 if feat_idx < 11 else 2)
                dil = grp_dil.get(stage + 1, 1) if isinstance(stage, int) else 1
                if stride == 2 and dil > 1:
                    stride, block_dil = 1, dil
                else:
                    block_dil = 1
                feats.append(InvertedResidual(
                    out_ch, stride, t, in_features=input_ch, iw=iw,
                    dilation=block_dil, dtype=self.dtype,
                    name=f"feat{feat_idx}"))
                groups[stage].append(feat_idx)
                input_ch = out_ch
                feat_idx += 1
        feats.append(ConvBNReLU6(self.last_channel, 1, dtype=self.dtype,
                                 name=f"feat{feat_idx}"))
        groups[3] = [feat_idx]
        self._groups = groups
        self.features = feats
        self.stage_channels = (
            _make_divisible(32 * self.width_mult),
            _make_divisible(64 * self.width_mult),
            _make_divisible(320 * self.width_mult),
            self.last_channel)
        self.stem_channels = _make_divisible(16 * self.width_mult)

    def _apply(self, idx: int, x, w_arr: list, train: bool):
        mod = self.features[idx]
        if isinstance(mod, InvertedResidual):
            return mod(x, w_arr, train)
        return mod(x, train)

    def stem(self, x, w_arr: list, train: bool):
        for i in self._groups["stem"]:
            x = self._apply(i, x, w_arr, train)
        return x

    def stage(self, i: int, x, w_arr: list, train: bool):
        for j in self._groups[i]:
            x = self._apply(j, x, w_arr, train)
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
