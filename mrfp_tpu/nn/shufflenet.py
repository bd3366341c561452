"""ShuffleNetV2 backbone (network/Shufflenet.py), NHWC.

iw placement mirrors the reference: wt_layer[2] replaces the stem BN
(Shufflenet.py:136-148 + zoo Layer0, network/deepv3.py:129-157), wt_layer[3..5]
land on the LAST block of stage2/3/4 (Shufflenet.py:151-161), wt_layer[6]
replaces the conv5 BN (zoo Layer4). Dilation surgery hits only the stride-2
convs (network/deepv3.py:194-202): D -> stage3 dil 2 + stage4 dil 4,
D16 -> stage4 dil 2.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrfp_tpu.nn.layers import conv2d, max_pool_3x3_s2
from mrfp_tpu.nn.norms import BatchNorm, apply_iw, make_iw_layer

_VARIANTS = {
    "x0.5": ((4, 8, 4), (24, 48, 96, 192, 1024)),
    "x1.0": ((4, 8, 4), (24, 116, 232, 464, 1024)),
    "x1.5": ((4, 8, 4), (24, 176, 352, 704, 1024)),
    "x2.0": ((4, 8, 4), (24, 244, 488, 976, 2048)),
}


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """NHWC equivalent of the NCHW view/transpose shuffle
    (Shufflenet.py:21-35): interleave the two channel halves."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(n, h, w, c)


class _ConvBN(nn.Module):
    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = conv2d(self.features, self.kernel_size, self.stride, pad,
                   self.dilation, groups=self.groups, dtype=self.dtype,
                   name="conv")(x)
        x = BatchNorm(self.features, name="bn")(x, train)
        return nn.relu(x) if self.relu else x


class InvertedResidual(nn.Module):
    """ShuffleNetV2 unit (Shufflenet.py:38-112)."""

    features: int
    stride: int = 1
    dilation: int = 1
    iw: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w_arr: list, train: bool):
        half = self.features // 2
        if self.stride == 1 and self.dilation == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            b2 = _ConvBN(half, 1, dtype=self.dtype, name="b2_pw1")(x2, train)
            b2 = _ConvBN(half, 3, 1, groups=half, relu=False,
                         dtype=self.dtype, name="b2_dw")(b2, train)
            b2 = _ConvBN(half, 1, dtype=self.dtype, name="b2_pw2")(b2, train)
            out = jnp.concatenate([x1, b2], axis=-1)
        else:
            inp = x.shape[-1]
            b1 = _ConvBN(inp, 3, self.stride, self.dilation, groups=inp,
                         relu=False, dtype=self.dtype, name="b1_dw")(x, train)
            b1 = _ConvBN(half, 1, dtype=self.dtype, name="b1_pw")(b1, train)
            b2 = _ConvBN(half, 1, dtype=self.dtype, name="b2_pw1")(x, train)
            b2 = _ConvBN(half, 3, self.stride, self.dilation, groups=half,
                         relu=False, dtype=self.dtype, name="b2_dw")(b2, train)
            b2 = _ConvBN(half, 1, dtype=self.dtype, name="b2_pw2")(b2, train)
            out = jnp.concatenate([b1, b2], axis=-1)
        out = channel_shuffle(out, 2)
        layer = make_iw_layer(self.iw, self.features, "instance_norm_layer")
        return apply_iw(layer, self.iw, out, w_arr, train)


class ShuffleNetV2(nn.Module):
    wt_layer: Tuple[int, ...] = (0,) * 7
    variant: str = "D16"
    scale: str = "x1.0"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        repeats, chans = _VARIANTS[self.scale]
        if self.variant == "D":
            stage_dil = {1: 2, 2: 4}   # zoo layer2=stage3, layer3=stage4
        elif self.variant == "D16":
            stage_dil = {2: 2}
        else:
            stage_dil = {}

        self.conv1 = conv2d(chans[0], 3, 2, 1, dtype=self.dtype, name="conv1")
        self.stem_norm = (make_iw_layer(self.wt_layer[2], chans[0], "stem_iw")
                          if self.wt_layer[2] else
                          BatchNorm(chans[0], name="stem_bn"))
        stages = []
        for si in range(3):
            dil = stage_dil.get(si, 1)
            blocks = []
            n = repeats[si]
            for i in range(n):
                iw = self.wt_layer[3 + si] if i == n - 1 else 0
                if i == 0:
                    blocks.append(InvertedResidual(
                        chans[si + 1], stride=1 if dil > 1 else 2,
                        dilation=dil, iw=iw, dtype=self.dtype,
                        name=f"stage{si + 2}_block{i}"))
                else:
                    blocks.append(InvertedResidual(
                        chans[si + 1], 1, 1, iw=iw, dtype=self.dtype,
                        name=f"stage{si + 2}_block{i}"))
            stages.append(blocks)
        self._stage_blocks = stages
        self.conv5 = conv2d(chans[4], 1, 1, 0, dtype=self.dtype, name="conv5")
        self.conv5_norm = (make_iw_layer(self.wt_layer[6], chans[4], "conv5_iw")
                           if self.wt_layer[6] else
                           BatchNorm(chans[4], name="conv5_bn"))
        self.stage_channels = tuple(chans[1:])
        self.stem_channels = chans[0]

    def _norm(self, mod, code: int, x, w_arr: list, train: bool):
        if code == 0:
            return mod(x, train)
        return apply_iw(mod, code, x, w_arr, train)

    def stem(self, x, w_arr: list, train: bool):
        x = self.conv1(x)
        # reference zoo Layer0: iw REPLACES the stem BN (deepv3.py:143-151)
        x = self._norm(self.stem_norm, self.wt_layer[2], x, w_arr, train)
        x = nn.relu(x)
        return max_pool_3x3_s2(x)

    def stage(self, i: int, x, w_arr: list, train: bool):
        if i < 3:
            for blk in self._stage_blocks[i]:
                x = blk(x, w_arr, train)
            return x
        x = self.conv5(x)
        x = self._norm(self.conv5_norm, self.wt_layer[6], x, w_arr, train)
        return nn.relu(x)

    def __call__(self, x, train: bool = False):
        w_arr: list = []
        x = self.stem(x, w_arr, train)
        feats = {"stem": x}
        for i in range(4):
            x = self.stage(i, x, w_arr, train)
            feats[f"layer{i + 1}"] = x
        feats["w_arr"] = w_arr
        return feats
