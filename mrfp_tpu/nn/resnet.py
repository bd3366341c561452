"""ResNet backbone family, NHWC, with the reference's iw-instrumentation.

Re-designs network/Resnet.py for TPU: the ``[x, w_arr]`` tuple threading of
the reference blocks (Resnet.py:114-145,192-227) becomes a plain Python list
collected at trace time; the D/D4/D16/D32 "dilation surgery" that the
reference performs by mutating built modules (deepv3.py:184-189,
network/deepv3.py:346-390) is a constructor-time stride/dilation plan, so
XLA sees static convolution configs.

Covers resnet-18/34/50/101/152 (Resnet.py:619-723), plus ResNeXt and
Wide-ResNet via ``groups``/``base_width`` (torchvision bottleneck math), the
trunks the zoo model pulls from torchvision (network/deepv3.py:328-339).

resnet-101 uses the deep 3x3x3 stem (ResNet3X3, Resnet.py:338-512).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrfp_tpu.nn.layers import Conv7x7S2D, conv2d, max_pool_3x3_s2
from mrfp_tpu.nn.norms import BatchNorm, apply_iw, make_iw_layer

# variant -> {stage_index (0-based): (stride, dilation)} overrides
_VARIANT_PLAN = {
    "D":   {2: (1, 2), 3: (1, 4)},          # os 8
    "D4":  {1: (1, 2), 2: (1, 4), 3: (1, 8)},  # os 4
    "D16": {3: (1, 2)},                      # os 16
    "D32": {},                               # os 32
}

_DEFAULT_STRIDES = (1, 2, 2, 2)


def variant_output_stride(variant: str) -> int:
    return {"D": 8, "D4": 4, "D16": 16, "D32": 32}.get(variant, 32)


def stage_plan(variant: str) -> List[Tuple[int, int]]:
    """Per-stage (stride, dilation), resolving the variant overrides."""
    over = _VARIANT_PLAN.get(variant, {})
    return [over.get(i, (_DEFAULT_STRIDES[i], 1)) for i in range(4)]


class BasicBlock(nn.Module):
    """Two 3x3 convs (Resnet.py:73-145). expansion = 1.

    Note: the reference's dilation surgery targets modules named 'conv2' and
    'downsample.0' only; on BasicBlock that leaves conv1's stride=2 in place,
    which cannot type-check. We implement the intended DeepLab semantics
    (whole block stride 1, dilated receptive field) — identical for the
    Bottleneck trunks the paper actually uses.
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    iw: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w_arr: list, train: bool):
        residual = x
        out = conv2d(self.planes, 3, self.stride, self.dilation, self.dilation,
                     dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, train)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, 1, self.dilation, self.dilation,
                     dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, train)
        if self.downsample:
            residual = conv2d(self.planes, 1, self.stride, 0,
                              dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(self.planes, name="downsample_bn")(residual, train)
        out = out + residual
        layer = make_iw_layer(self.iw, self.planes, "instance_norm_layer")
        out = apply_iw(layer, self.iw, out, w_arr, train)
        return nn.relu(out)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 x4 (Resnet.py:148-227). expansion = 4.

    ``groups``/``base_width`` extend to ResNeXt (32x4d/32x8d) and
    Wide-ResNet (base_width 128) with torchvision's width rule.
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    iw: int = 0
    groups: int = 1
    base_width: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w_arr: list, train: bool, inject=None):
        """``inject``: optional (site, value) additive perturbation INSIDE
        the block — the 'matchstick' capability (Resnet.py:229-334
        Bottleneckmatchstick): site 1 adds ``value`` to conv1's input (the
        residual path still sees the unperturbed x, Resnet.py:288-294),
        site 2 adds it to conv2's input."""
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        residual = x  # downsample also reads the UNPERTURBED x
        conv1_in = x if inject is None or inject[0] != 1 else x + inject[1]
        out = self._conv1x1_bn(conv1_in, width, 1, "conv1", "bn1", train)
        out = nn.relu(out)
        if inject is not None and inject[0] == 2:
            out = out + inject[1]
        out = conv2d(width, 3, self.stride, self.dilation, self.dilation,
                     groups=self.groups, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(width, name="bn2")(out, train)
        out = nn.relu(out)
        out = self._conv1x1_bn(out, out_ch, 1, "conv3", "bn3", train)
        if self.downsample:
            residual = self._conv1x1_bn(x, out_ch, self.stride,
                                        "downsample_conv", "downsample_bn",
                                        train)
        out = out + residual
        layer = make_iw_layer(self.iw, out_ch, "instance_norm_layer")
        out = apply_iw(layer, self.iw, out, w_arr, train)
        return nn.relu(out)

    def _conv1x1_bn(self, x, feat: int, stride: int, cname: str, bname: str,
                    train: bool):
        """1x1 conv + BN, optionally with the fused stats epilogue (the
        dot emits the BN sums in the same VMEM pass — no re-read; opted in
        per-trace via cfg.train.fuse_bn_stats). Same param pytree either
        way, so checkpoints are interchangeable."""
        from mrfp_tpu.ops.pallas_dot_stats import bn_stats_fusion_active
        if train and bn_stats_fusion_active():
            from mrfp_tpu.nn.layers import DotConv1x1Stats
            y, s1, s2, n = DotConv1x1Stats(
                feat, stride=stride, dtype=self.dtype, name=cname)(x)
            return BatchNorm(feat, name=bname)(y, train, stats=(s1, s2, n))
        y = conv2d(feat, 1, stride, 0, dtype=self.dtype, name=cname)(x)
        return BatchNorm(feat, name=bname)(y, train)


class _Stage(nn.Module):
    """One residual stage; iw code lands on the LAST block only
    (Resnet.py:579-584: block 0 is built with iw=0, later blocks get the
    code only at index == blocks-1)."""

    block_cls: type
    planes: int
    blocks: int
    in_ch: int
    stride: int = 1
    dilation: int = 1
    iw: int = 0
    groups: int = 1
    base_width: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w_arr: list, train: bool, inject=None):
        """``inject``: optional (block_idx, site, value) — routes a
        matchstick-style additive perturbation into one block (Bottleneck
        only; Resnet.py:229-334)."""
        expansion = 4 if self.block_cls is Bottleneck else 1
        out_ch = self.planes * expansion
        extra = (dict(groups=self.groups, base_width=self.base_width)
                 if self.block_cls is Bottleneck else {})
        for i in range(self.blocks):
            iw = self.iw if (self.iw > 0 and i == self.blocks - 1) else 0
            kw = {}
            if inject is not None and inject[0] == i:
                kw["inject"] = (inject[1], inject[2])
            x = self.block_cls(
                planes=self.planes,
                stride=self.stride if i == 0 else 1,
                dilation=self.dilation,
                downsample=(i == 0 and (self.stride != 1 or self.in_ch != out_ch)),
                iw=iw,
                dtype=self.dtype,
                name=f"block{i}",
                **extra,
            )(x, w_arr, train, **kw)
        return x


class ResNet(nn.Module):
    """Backbone exposing stem + 4 stages separately so models can inject
    perturbations between them (MRFPPlus interleaves NP+/OC with layer0/1,
    deepv3.py:309-342)."""

    block: str = "bottleneck"            # 'basic' | 'bottleneck'
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    wt_layer: Tuple[int, ...] = (0, 0, 0, 0, 0, 0, 0)
    variant: str = "D16"
    deep_stem: bool = False              # ResNet3X3 stem (resnet-101)
    groups: int = 1
    base_width: int = 64
    remat: bool = False                  # rematerialize stages (memory/batch)
    s2d_stem: bool = True                # space-to-depth 7x7 stem reparam
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        plan = stage_plan(self.variant)
        # remat is incompatible with the w_arr side channel (codes 1/2 append
        # whitening maps that must escape the checkpointed scope)
        stage_cls = _Stage
        if self.remat and not any(c in (1, 2) for c in self.wt_layer):
            stage_cls = nn.remat(_Stage, static_argnums=(3,))

        if self.deep_stem:
            self.conv1 = conv2d(64, 3, 2, 1, dtype=self.dtype, name="conv1")
            self.stem_iw1 = make_iw_layer(self.wt_layer[0], 64, "bn1_iw") \
                if self.wt_layer[0] else BatchNorm(64, name="bn1")
            self.conv2 = conv2d(64, 3, 1, 1, dtype=self.dtype, name="conv2")
            self.stem_iw2 = make_iw_layer(self.wt_layer[1], 64, "bn2_iw") \
                if self.wt_layer[1] else BatchNorm(64, name="bn2")
            self.conv3 = conv2d(128, 3, 1, 1, dtype=self.dtype, name="conv3")
            self.stem_iw3 = make_iw_layer(self.wt_layer[2], 128, "bn3_iw") \
                if self.wt_layer[2] else BatchNorm(128, name="bn3")
            in_ch = 128
        else:
            # same param tree either way (conv1/kernel, 7x7x3x64 HWIO); the
            # s2d path computes the exact same conv MXU-friendly
            # (layers.Conv7x7S2D)
            self.conv1 = Conv7x7S2D(64, dtype=self.dtype, name="conv1") \
                if self.s2d_stem else \
                conv2d(64, 7, 2, 3, dtype=self.dtype, name="conv1")
            # stem norm selected by wt_layer[2] (Resnet.py:525-549)
            self.stem_iw1 = make_iw_layer(self.wt_layer[2], 64, "bn1_iw") \
                if self.wt_layer[2] else BatchNorm(64, name="bn1")
            in_ch = 64

        stages = []
        planes = (64, 128, 256, 512)
        for i in range(4):
            stride, dilation = plan[i]
            stages.append(stage_cls(
                block_cls=block_cls, planes=planes[i], blocks=self.layers[i],
                in_ch=in_ch, stride=stride, dilation=dilation,
                iw=self.wt_layer[3 + i], groups=self.groups,
                base_width=self.base_width, dtype=self.dtype,
                name=f"layer{i + 1}",
            ))
            in_ch = planes[i] * expansion
        self.stages = stages
        self.stage_channels = tuple(p * expansion for p in planes)

    def stem(self, x, w_arr: list, train: bool):
        """layer0: conv(s)+norm+relu+maxpool (Resnet.py:587-598,471-496)."""
        if self.deep_stem:
            for conv, iw_mod, code in ((self.conv1, self.stem_iw1, self.wt_layer[0]),
                                       (self.conv2, self.stem_iw2, self.wt_layer[1]),
                                       (self.conv3, self.stem_iw3, self.wt_layer[2])):
                x = conv(x)
                x = self._stem_norm(iw_mod, code, x, w_arr, train)
                x = nn.relu(x)
        else:
            if isinstance(self.conv1, Conv7x7S2D):
                # space-to-depth stem only where it wins (see Conv7x7S2D
                # docstring: always for train, bf16-only for eval)
                x = self.conv1(x, prefer_direct=not train)
            else:
                x = self.conv1(x)
            x = self._stem_norm(self.stem_iw1, self.wt_layer[2], x, w_arr, train)
            x = nn.relu(x)
        return max_pool_3x3_s2(x)

    def _stem_norm(self, mod, code: int, x, w_arr: list, train: bool):
        if code == 0:
            return mod(x, train)  # BatchNorm
        return apply_iw(mod, code, x, w_arr, train)

    def stage(self, i: int, x, w_arr: list, train: bool, inject=None):
        """``inject``: optional (block_idx, site, value) matchstick-style
        in-block perturbation (Resnet.py:664-723 resnet50matchstick/adapt101
        route a tensor into a chosen block; here every Bottleneck accepts it
        natively — no separate trunk class needed)."""
        return self.stages[i](x, w_arr, train, inject=inject)

    def __call__(self, x, train: bool = False):
        """Full backbone pass returning the multi-scale feature dict."""
        w_arr: list = []
        x = self.stem(x, w_arr, train)
        feats = {"stem": x}
        for i in range(4):
            x = self.stage(i, x, w_arr, train)
            feats[f"layer{i + 1}"] = x
        feats["w_arr"] = w_arr
        return feats


def resnet18(**kw) -> ResNet:
    return ResNet(block="basic", layers=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(block="basic", layers=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 23, 3), deep_stem=True, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 8, 36, 3), **kw)


# The reference's 'matchstick' trunks (Resnet.py:662-723) are ordinary
# ResNets whose Bottleneck accepts an in-block additive perturbation; here
# EVERY Bottleneck supports that natively (stage(..., inject=(block, site,
# value))), so the matchstick builders are plain aliases.
resnet50matchstick = resnet50
resnet101matchstick = resnet101


def adapt101(**kw) -> ResNet:
    """Resnet.py:706-723 — resnet-101 with matchstick blocks; see above."""
    return resnet101(**kw)


def resnext50_32x4d(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3), groups=32, base_width=4, **kw)


def resnext101_32x8d(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 23, 3), groups=32, base_width=8, **kw)


def wide_resnet50_2(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 6, 3), base_width=128, **kw)


def wide_resnet101_2(**kw) -> ResNet:
    return ResNet(block="bottleneck", layers=(3, 4, 23, 3), base_width=128, **kw)
