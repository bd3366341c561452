"""SE-ResNeXt / SENet / WiderResNet block parity vs torch functional oracles.

Covers the remaining zoo trunks that only had build/shape tests: the grouped
SE bottlenecks with squeeze-excitation (SEresnext.py:70-193), the Caffe
ceil-mode max pool (SEresnext.py:330-333), and the pre-activation
identity-residual block incl. the normalized-input projection shortcut
(wider_resnet.py:64-185). Weights are copied from our initialized params into
a torch functional re-implementation of the reference math.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mrfp_tpu.nn.seresnext import SEBottleneckBlock, max_pool_ceil
from mrfp_tpu.nn.wider_resnet import IdentityResidualBlock

from test_blocks_parity import _k, _conv_w, _bn_torch


def _randomize(rng, params):
    return jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.standard_normal(v.shape).astype(np.float32)
                              * 0.2 + np.asarray(v)), params)


def _bias(params, *path):
    return torch.from_numpy(np.asarray(_k(params, *path, "bias")).copy())


def _se_torch(out, params):
    s = out.mean((2, 3), keepdim=True)
    s = F.relu(F.conv2d(s, _conv_w(params, "se_module", "fc1"),
                        _bias(params, "se_module", "fc1")))
    s = torch.sigmoid(F.conv2d(s, _conv_w(params, "se_module", "fc2"),
                               _bias(params, "se_module", "fc2")))
    return out * s


def test_seresnext_bottleneck_stride2_parity():
    """SEResNeXtBottleneck: 1x1 -> grouped 3x3 s2 -> 1x1 -> SE, with the
    1x1/s2 downsample; width = floor(planes*base_width/64)*groups."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    blk = SEBottleneckBlock(planes=16, kind="seresnext", groups=8,
                            reduction=4, stride=2, has_downsample=True,
                            base_width=4)
    vs = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    params = _randomize(rng, vs["params"])
    ours, _ = blk.apply({"params": params, "batch_stats": vs["batch_stats"]},
                        jnp.asarray(x), True, mutable=["batch_stats"])

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    out = F.relu(_bn_torch(F.conv2d(t, _conv_w(params, "conv1")),
                           params, "bn1"))
    out = F.conv2d(out, _conv_w(params, "conv2"), stride=2, padding=1,
                   groups=8)
    out = F.relu(_bn_torch(out, params, "bn2"))
    out = _bn_torch(F.conv2d(out, _conv_w(params, "conv3")), params, "bn3")
    out = _se_torch(out, params)
    res = _bn_torch(F.conv2d(t, _conv_w(params, "downsample_conv"), stride=2),
                    params, "downsample_bn")
    ref = np.transpose(F.relu(out + res).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_senet_bottleneck_3x3_downsample_parity():
    """SEBottleneck (SENet-154 kind): conv1 widens to planes*2, the grouped
    3x3 carries the stride AND the widening to planes*4, and the downsample
    is a 3x3/pad-1 conv (SEresnext.py:120-143, 276-283)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 8, 24)).astype(np.float32)
    blk = SEBottleneckBlock(planes=8, kind="senet", groups=8, reduction=4,
                            stride=2, downsample_kernel=3, downsample_pad=1,
                            has_downsample=True)
    vs = blk.init(jax.random.PRNGKey(1), jnp.asarray(x), True)
    params = _randomize(rng, vs["params"])
    ours, _ = blk.apply({"params": params, "batch_stats": vs["batch_stats"]},
                        jnp.asarray(x), True, mutable=["batch_stats"])

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    out = F.relu(_bn_torch(F.conv2d(t, _conv_w(params, "conv1")),
                           params, "bn1"))
    out = F.conv2d(out, _conv_w(params, "conv2"), stride=2, padding=1,
                   groups=8)
    out = F.relu(_bn_torch(out, params, "bn2"))
    out = _bn_torch(F.conv2d(out, _conv_w(params, "conv3")), params, "bn3")
    out = _se_torch(out, params)
    res = _bn_torch(F.conv2d(t, _conv_w(params, "downsample_conv"), stride=2,
                             padding=1), params, "downsample_bn")
    ref = np.transpose(F.relu(out + res).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_max_pool_ceil_matches_torch():
    """ceil_mode max pool on odd sizes (the Caffe stem pool): partial
    bottom/right windows must count."""
    rng = np.random.default_rng(4)
    for h, w in ((7, 9), (8, 8), (5, 6)):
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        ours = np.asarray(max_pool_ceil(jnp.asarray(x)))
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        ref = F.max_pool2d(t, 3, 2, 0, ceil_mode=True)
        np.testing.assert_array_equal(
            ours, np.transpose(ref.numpy(), (0, 2, 3, 1)))


def test_wider_bottleneck_proj_parity():
    """Pre-act bottleneck with channel change + stride: the projection
    shortcut reads the NORMALIZED input (bn1 output), not x."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, 8, 12)).astype(np.float32)
    blk = IdentityResidualBlock(channels=(8, 8, 16), stride=2)
    vs = blk.init(jax.random.PRNGKey(2), jnp.asarray(x), True)
    params = _randomize(rng, vs["params"])
    ours, _ = blk.apply({"params": params, "batch_stats": vs["batch_stats"]},
                        jnp.asarray(x), True, mutable=["batch_stats"])

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    bn1 = F.relu(_bn_torch(t, params, "bn1", "bn"))
    shortcut = F.conv2d(bn1, _conv_w(params, "proj_conv"), stride=2)
    out = F.conv2d(bn1, _conv_w(params, "conv1"), stride=2)
    out = F.relu(_bn_torch(out, params, "bn2", "bn"))
    out = F.conv2d(out, _conv_w(params, "conv2"), padding=1)
    out = F.relu(_bn_torch(out, params, "bn3", "bn"))
    out = F.conv2d(out, _conv_w(params, "conv3"))
    ref = np.transpose((out + shortcut).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_wider_twoconv_dilated_identity_parity():
    """Two-conv variant, dilation 2, identity shortcut (no projection):
    shortcut is raw x while the conv path reads bn1."""
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 9, 9, 8)).astype(np.float32)
    blk = IdentityResidualBlock(channels=(8, 8), dilation=2)
    vs = blk.init(jax.random.PRNGKey(3), jnp.asarray(x), True)
    params = _randomize(rng, vs["params"])
    ours, _ = blk.apply({"params": params, "batch_stats": vs["batch_stats"]},
                        jnp.asarray(x), True, mutable=["batch_stats"])

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    bn1 = F.relu(_bn_torch(t, params, "bn1", "bn"))
    out = F.conv2d(bn1, _conv_w(params, "conv1"), padding=2, dilation=2)
    out = F.relu(_bn_torch(out, params, "bn2", "bn"))
    out = F.conv2d(out, _conv_w(params, "conv2"), padding=2, dilation=2)
    ref = np.transpose((out + t).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)
