"""Conv / pool / init primitives with torch-equivalent semantics, NHWC.

Initializers mirror the reference exactly:
- backbone convs: kaiming_normal fan_out relu (network/Resnet.py:561-563)
- decoder/head convs: kaiming_normal fan_in relu (network/mynn.py:38-55)
- OC-branch BN gamma ~ N(0, std) (network/mynn.py:57-74) lives in perturb/.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

# torch nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch nn.init.kaiming_normal_(nonlinearity='relu') — default mode='fan_in'
kaiming_fan_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(features: int,
           kernel_size: Union[int, Tuple[int, int]] = 3,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[int, Tuple[int, int]] = 0,
           dilation: Union[int, Tuple[int, int]] = 1,
           groups: int = 1,
           bias: bool = False,
           kernel_init=kaiming_fan_out,
           dtype: Optional[jnp.dtype] = None,
           name: Optional[str] = None) -> nn.Conv:
    """2-D conv matching torch nn.Conv2d(padding=int) semantics.

    Explicit symmetric zero padding (never 'SAME' — torch pads before
    striding, which differs from SAME for even strides). Kernels are HWIO so
    the MXU sees its preferred layout without transposes.
    """
    p = _pair(padding)
    return nn.Conv(
        features=features,
        kernel_size=_pair(kernel_size),
        strides=_pair(stride),
        padding=[(p[0], p[0]), (p[1], p[1])],
        kernel_dilation=_pair(dilation),
        feature_group_count=groups,
        use_bias=bias,
        kernel_init=kernel_init,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class PointwiseConv(nn.Module):
    """1x1 conv computed as a matmul on the flattened (N*H*W, C) map.

    Bit-identical math and param pytree to ``nn.Conv(kernel_size=(1,1))``
    (HWIO (1,1,Cin,Cout) kernel + (Cout,) bias — checkpoint compatible), but
    lowered to a dot: XLA's TPU conv layout assignment prefers a
    batch-in-sublanes activation layout ({3,0,2,1}) that forces relayout
    copies (604 MB each on the MRFP+ final2 dual-resolution chain, profiled)
    whenever the producer/consumer is an elementwise fusion or Pallas call
    pinned to the standard {3,2,1,0} layout. A dot on (N*H*W, C) is a bitcast
    away from standard NHWC, so the chain keeps one layout end-to-end.
    """

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = kaiming_fan_in
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, cin, self.features), jnp.float32)
        # dtype=None matches flax promotion: promote x.dtype with the f32
        # params, so bf16 inputs compute in f32 exactly like nn.Conv would.
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        y = jnp.dot(x.astype(dt).reshape(-1, cin), kernel[0, 0].astype(dt))
        y = y.reshape(*x.shape[:-1], self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


class DotConv1x1Stats(nn.Module):
    """1x1 conv as a dot that ALSO emits per-channel BN statistics from the
    same VMEM pass (ops/pallas_dot_stats.py) — saves the BN-stat re-read of
    the conv output on the bandwidth-bound train step.

    Param pytree identical to ``conv2d(features, 1, stride, 0)`` (HWIO
    (1,1,Cin,Cout) "kernel", no bias), so it is checkpoint-interchangeable
    with the nn.Conv form at every bottleneck site (network/Resnet.py:
    148-227). A strided 1x1 conv reads only the kept pixels, so stride is a
    slice before the dot — bit-identical to the conv.
    """

    features: int
    stride: int = 1
    kernel_init: nn.initializers.Initializer = kaiming_fan_out
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from mrfp_tpu.ops.pallas_dot_stats import dot_with_stats
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, cin, self.features), jnp.float32)
        if self.stride != 1:
            x = x[:, ::self.stride, ::self.stride, :]
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        n, h, w, _ = x.shape
        y, s1, s2 = dot_with_stats(x.astype(dt).reshape(-1, cin),
                                   kernel[0, 0].astype(dt))
        return (y.reshape(n, h, w, self.features), s1, s2,
                n * h * w)


def max_pool_3x3_s2(x):
    """torch nn.MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def avg_pool_global(x):
    """AdaptiveAvgPool2d(1): NHWC -> N11C."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


class Conv7x7S2D(nn.Module):
    """The ResNet stem conv (7x7 stride 2 pad 3, no bias) computed through a
    space-to-depth reparameterization.

    A 3-channel 7x7 conv starves the MXU: the contraction dim (3 channels)
    pads to a full lane tile and the kernel walks a 768^2 grid. Rearranging
    the input into 2x2 blocks ((N,H,W,3) -> (N,H/2,W/2,12)) and the 7x7x3
    kernel into an equivalent 4x4x12 kernel (stride 1, asymmetric pad (2,1))
    computes the EXACT same products on a 4x larger contraction dim and a
    4x smaller grid. The parameter keeps the reference 7x7x3xO HWIO layout
    (checkpoint parity); the rearrangement is a cheap traced reshape of the
    9.4k-element kernel, so gradients flow unchanged.

    Falls back to the direct conv for odd spatial sizes (Mapillary heights)
    and when ``prefer_direct=True`` with an f32 compute dtype. Measured on
    1024x2048 eval (v5e, 2026-08-17): the S2D input rearrangement costs
    4.8 ms/img at f32 (reshape.8 3.7 + copy.118 1.1 in the profile) and the
    direct conv wins 35.2 -> 36.9 img/s; at bf16 the rearrangement bytes
    halve while the 3-channel MXU starvation it fixes does not, and S2D
    still wins (48.5 vs 46.3 direct). So: train always S2D (+0.5% on the
    bs8 768^2 bf16 step), eval S2D iff compute dtype is sub-f32. Both paths
    share the reference 7x7 param — purely a lowering choice.
    """

    features: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, prefer_direct: bool = False):
        kernel = self.param("kernel", kaiming_fan_out,
                            (7, 7, x.shape[-1], self.features), jnp.float32)
        import jax.lax as lax

        n, h, w, c = x.shape
        dtype = self.dtype or x.dtype
        direct = prefer_direct and jnp.dtype(dtype).itemsize >= 4
        if direct or h % 2 or w % 2:
            return lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), (2, 2),
                [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # input: 2x2 space-to-depth, channel order (a, b, c)
        xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        # kernel: out[i] tap u reads input row 2i+u-3 = 2(i+s)+a with
        # u = 2s+3+a; padding row -1 makes the (s=-2, a=0) slot a zero tap,
        # then rows (-1..6) reshape directly into (s, a)
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        o = self.features
        k4 = kp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
        k4 = k4.reshape(4, 4, 4 * c, o)
        return lax.conv_general_dilated(
            xs.astype(dtype), k4.astype(dtype), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
