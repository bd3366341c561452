"""ASPP and the DeepLabV3+ decoder heads (deepv3.py:64-126,197-219).

Concat order is load-bearing for checkpoint parity: ASPP output channels are
[image-pool(256), 1x1(256), d6(256), d12(256), d18(256)] -> 1280
(deepv3.py:114-126), and the decoder concat is [bot_fine(48), upsampled
bot_aspp(256)] -> 304 (deepv3.py:350-353).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrfp_tpu.nn.layers import avg_pool_global, conv2d, kaiming_fan_in
from mrfp_tpu.nn.norms import BatchNorm
from mrfp_tpu.ops.resize import resize_bilinear_align_corners


def aspp_rates(output_stride: int, rates: Tuple[int, ...] = (6, 12, 18)) -> Tuple[int, ...]:
    """Dilation rates scaled by output stride (deepv3.py:82-91)."""
    if output_stride == 8:
        return tuple(2 * r for r in rates)
    if output_stride == 4:
        return tuple(4 * r for r in rates)
    if output_stride == 16:
        return rates
    if output_stride == 32:
        return tuple(r // 2 for r in rates)
    raise ValueError(f"output stride {output_stride} not supported")


class ConvBNReLU(nn.Module):
    """conv -> Norm2d -> ReLU with the head init (kaiming fan_in relu,
    network/mynn.py:38-55)."""

    features: int
    kernel_size: int = 3
    padding: int = 0
    dilation: int = 1
    bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv2d(self.features, self.kernel_size, 1, self.padding,
                   self.dilation, bias=self.bias, kernel_init=kaiming_fan_in,
                   dtype=self.dtype, name="conv")(x)
        x = BatchNorm(self.features, name="bn")(x, train)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (deepv3.py:64-126).

    ``valid_hw`` (traced int32 [2], in this feature map's coordinates)
    restricts the image-level pooling to the valid region when the input was
    bottom/right zero-padded up to a shape bucket (train/evaluator.py). The
    reference evaluates exact shapes (main.py:896), where the global pool
    sees only real pixels; without the mask, padded zeros shift the pooled
    feature that is broadcast to every pixel.
    """

    reduction_dim: int = 256
    output_stride: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool, valid_hw=None):
        size = (x.shape[1], x.shape[2])
        # image-level features first (deepv3.py:117-122)
        if valid_hw is None:
            img = avg_pool_global(x)
        else:
            vh = valid_hw[0].astype(jnp.int32)
            vw = valid_hw[1].astype(jnp.int32)
            rows = (jnp.arange(x.shape[1]) < vh)[None, :, None, None]
            cols = (jnp.arange(x.shape[2]) < vw)[None, None, :, None]
            mask = (rows & cols).astype(x.dtype)
            img = jnp.sum(x * mask, axis=(1, 2), keepdims=True) / (
                (vh * vw).astype(x.dtype))
        img = ConvBNReLU(256, 1, dtype=self.dtype, name="img_conv")(img, train)
        img = resize_bilinear_align_corners(img, size)
        outs = [img]
        outs.append(ConvBNReLU(self.reduction_dim, 1, dtype=self.dtype,
                               name="feat0")(x, train))
        for i, r in enumerate(aspp_rates(self.output_stride)):
            outs.append(ConvBNReLU(self.reduction_dim, 3, padding=r, dilation=r,
                                   dtype=self.dtype, name=f"feat{i + 1}")(x, train))
        return jnp.concatenate(outs, axis=-1)


class DeepLabDecoder(nn.Module):
    """bot_fine / bot_aspp / final1 of DeepLabV3+ (deepv3.py:200-216).

    Returns dec1 at the low-level (H/4) resolution; the classifier final2 and
    the MRFP+ injection happen in the model, which owns the p3 gate.
    """

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, aspp_out, low_level, train: bool):
        dec0_up = ConvBNReLU(256, 1, dtype=self.dtype, name="bot_aspp")(aspp_out, train)
        dec0_fine = ConvBNReLU(48, 1, dtype=self.dtype, name="bot_fine")(low_level, train)
        dec0_up = resize_bilinear_align_corners(
            dec0_up, (low_level.shape[1], low_level.shape[2]), impl="matmul")
        dec0 = jnp.concatenate([dec0_fine, dec0_up], axis=-1)
        dec1 = ConvBNReLU(256, 3, padding=1, dtype=self.dtype, name="final1_0")(dec0, train)
        dec1 = ConvBNReLU(256, 3, padding=1, dtype=self.dtype, name="final1_1")(dec1, train)
        return dec1


class DSNHead(nn.Module):
    """Auxiliary DSN head on layer3 (network/deepv3.py:417-424)."""

    num_classes: int = 19
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBNReLU(512, 3, padding=1, bias=True, dtype=self.dtype,
                       name="conv")(x, train)
        # dropout 0.1 in the reference zoo head; deterministic at eval
        x = nn.Dropout(rate=0.1, deterministic=not train)(x)
        return conv2d(self.num_classes, 1, bias=True, kernel_init=kaiming_fan_in,
                      dtype=self.dtype, name="classifier")(x)
