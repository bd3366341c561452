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


def max_pool_3x3_s2(x):
    """torch nn.MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def avg_pool_global(x):
    """AdaptiveAvgPool2d(1): NHWC -> N11C."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
