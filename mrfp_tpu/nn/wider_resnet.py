"""WiderResNet / WiderResNetA2 (network/wider_resnet.py), NHWC.

Pre-activation identity-residual trunk in 16/20/38 depths; the A2 variant
max-pools only after mod1/mod2 and (with ``dilation=True``) dilates mod5 by 2
and mod6/mod7 by 4 with a single stride-2 in mod4 — the os-8 configuration
RobustNet-style DeepLab heads consume. Dropout2d 0.3/0.5 inside mod6/mod7
bottlenecks (wider_resnet.py:333-338).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrfp_tpu.nn.layers import conv2d, max_pool_3x3_s2
from mrfp_tpu.nn.norms import BatchNorm

_STRUCTURES = {16: (1, 1, 1, 1, 1, 1), 20: (1, 1, 1, 3, 1, 1),
               38: (3, 3, 6, 3, 1, 1)}
_CHANNELS = ((128, 128), (256, 256), (512, 512), (512, 1024),
             (512, 1024, 2048), (1024, 2048, 4096))


class _BNReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.relu(BatchNorm(self.features, name="bn")(x, train))


class IdentityResidualBlock(nn.Module):
    """Pre-act residual (wider_resnet.py:64-185): bn1 -> convs; projection
    shortcut taken from the *normalized* input when shapes change."""

    channels: Tuple[int, ...]
    stride: int = 1
    dilation: int = 1
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        ch = self.channels
        is_bottleneck = len(ch) == 3
        need_proj = self.stride != 1 or x.shape[-1] != ch[-1]

        bn1 = _BNReLU(x.shape[-1], name="bn1")(x, train)
        shortcut = x
        if need_proj:
            shortcut = conv2d(ch[-1], 1, self.stride, 0, dtype=self.dtype,
                              name="proj_conv")(bn1)

        if not is_bottleneck:
            out = conv2d(ch[0], 3, self.stride, self.dilation, self.dilation,
                         dtype=self.dtype, name="conv1")(bn1)
            out = _BNReLU(ch[0], name="bn2")(out, train)
            if self.dropout:
                out = nn.Dropout(self.dropout, deterministic=not train)(out)
            out = conv2d(ch[1], 3, 1, self.dilation, self.dilation,
                         dtype=self.dtype, name="conv2")(out)
        else:
            out = conv2d(ch[0], 1, self.stride, 0, dtype=self.dtype,
                         name="conv1")(bn1)
            out = _BNReLU(ch[0], name="bn2")(out, train)
            out = conv2d(ch[1], 3, 1, self.dilation, self.dilation,
                         dtype=self.dtype, name="conv2")(out)
            out = _BNReLU(ch[1], name="bn3")(out, train)
            if self.dropout:
                out = nn.Dropout(self.dropout, deterministic=not train)(out)
            out = conv2d(ch[2], 1, 1, 0, dtype=self.dtype, name="conv3")(out)
        return out + shortcut


class WiderResNetA2(nn.Module):
    """wider_resnet.py:267-380."""

    structure: Tuple[int, ...] = (3, 3, 6, 3, 1, 1)
    dilation: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        mods = []
        for mod_id, num in enumerate(self.structure):
            blocks = []
            for block_id in range(num):
                if not self.dilation:
                    dil = 1
                    stride = 2 if block_id == 0 and 2 <= mod_id <= 4 else 1
                else:
                    dil = 2 if mod_id == 3 else (4 if mod_id > 3 else 1)
                    stride = 2 if block_id == 0 and mod_id == 2 else 1
                drop = 0.3 if mod_id == 4 else (0.5 if mod_id == 5 else None)
                blocks.append(IdentityResidualBlock(
                    _CHANNELS[mod_id], stride=stride, dilation=dil,
                    dropout=drop, dtype=self.dtype,
                    name=f"mod{mod_id + 2}_block{block_id + 1}"))
            mods.append(blocks)
        self._mods = mods
        self.conv1 = conv2d(64, 3, 1, 1, dtype=self.dtype, name="mod1_conv1")
        self.bn_out = _BNReLU(_CHANNELS[-1][-1], name="bn_out")
        self.stage_channels = (256, 512, 1024, 4096)

    def __call__(self, x, train: bool = False):
        out = self.conv1(x)
        feats = {}
        for mod_id in range(6):
            if mod_id < 2:
                out = max_pool_3x3_s2(out)
            for blk in self._mods[mod_id]:
                out = blk(out, train)
            feats[f"mod{mod_id + 2}"] = out
        out = self.bn_out(out, train)
        feats["out"] = out
        return feats

    # uniform backbone interface for the DeepLab heads: low-level skip from
    # mod3 (256ch), final features from bn_out
    def stem(self, x, w_arr: list, train: bool):
        out = self.conv1(x)
        out = max_pool_3x3_s2(out)
        for blk in self._mods[0]:
            out = blk(out, train)
        return out

    def stage(self, i: int, x, w_arr: list, train: bool):
        if i == 0:
            x = max_pool_3x3_s2(x)
            for blk in self._mods[1]:
                x = blk(x, train)
            return x
        if i in (1, 2):
            for blk in self._mods[i + 1]:
                x = blk(x, train)
            return x
        for blk in self._mods[4]:
            x = blk(x, train)
        for blk in self._mods[5]:
            x = blk(x, train)
        return self.bn_out(x, train)


class WiderResNet(nn.Module):
    """wider_resnet.py:187-265 — pools before mod2..mod6."""

    structure: Tuple[int, ...] = (3, 3, 6, 3, 1, 1)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        mods = []
        for mod_id, num in enumerate(self.structure):
            blocks = [IdentityResidualBlock(
                _CHANNELS[mod_id], dtype=self.dtype,
                name=f"mod{mod_id + 2}_block{block_id + 1}")
                for block_id in range(num)]
            mods.append(blocks)
        self._mods = mods
        self.conv1 = conv2d(64, 3, 1, 1, dtype=self.dtype, name="mod1_conv1")
        self.bn_out = _BNReLU(_CHANNELS[-1][-1], name="bn_out")

    def __call__(self, x, train: bool = False):
        out = self.conv1(x)
        for mod_id in range(6):
            out = max_pool_3x3_s2(out)  # pool2..pool7 precede every module
            for blk in self._mods[mod_id]:
                out = blk(out, train)
        return self.bn_out(out, train)


def wider_resnet38_a2(**kw) -> WiderResNetA2:
    return WiderResNetA2(structure=_STRUCTURES[38], **kw)


def wider_resnet20_a2(**kw) -> WiderResNetA2:
    return WiderResNetA2(structure=_STRUCTURES[20], **kw)


def wider_resnet16_a2(**kw) -> WiderResNetA2:
    return WiderResNetA2(structure=_STRUCTURES[16], **kw)
