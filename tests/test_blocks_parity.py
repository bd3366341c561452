"""Grouped/depthwise conv block parity vs torch functional oracles:
MobileNetV2 inverted residual (Mobilenet.py:95-174) and ShuffleNetV2 unit
(Shufflenet.py:38-112). Validates flax feature_group_count == torch groups
and the block wiring, with weights copied from our initialized params."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mrfp_tpu.nn.mobilenet import InvertedResidual as MBBlock
from mrfp_tpu.nn.shufflenet import InvertedResidual as SHBlock


def _k(params, *path):
    node = params
    for p in path:
        node = node[p]
    return node


def _conv_w(params, *path):
    return torch.from_numpy(
        np.transpose(np.asarray(_k(params, *path, "kernel")), (3, 2, 0, 1)).copy())


def _bn_torch(x, params, *path):
    scale = torch.from_numpy(np.asarray(_k(params, *path, "scale")).copy())
    bias = torch.from_numpy(np.asarray(_k(params, *path, "bias")).copy())
    return F.batch_norm(x, None, None, scale, bias, training=True, eps=1e-5)


def test_mobilenet_inverted_residual_parity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    blk = MBBlock(features=16, stride=1, expand_ratio=6, in_features=16)
    vs = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), [], True)
    # randomize affine params so BN isn't identity-ish
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.standard_normal(v.shape).astype(np.float32) * 0.2
                              + np.asarray(v)), vs["params"])
    ours, _ = blk.apply({"params": params, "batch_stats": vs["batch_stats"]},
                        jnp.asarray(x), [], True, mutable=["batch_stats"])

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    hidden = 96
    out = F.conv2d(t, _conv_w(params, "expand", "conv"))
    out = _bn_torch(out, params, "expand", "bn")
    out = torch.clamp(out, 0, 6)
    out = F.conv2d(out, _conv_w(params, "dw", "conv"), stride=1, padding=1,
                   groups=hidden)
    out = _bn_torch(out, params, "dw", "bn")
    out = torch.clamp(out, 0, 6)
    out = F.conv2d(out, _conv_w(params, "project"))
    out = _bn_torch(out, params, "project_bn")
    out = t + out  # residual: stride 1, in == out channels
    ref = np.transpose(out.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_shufflenet_unit_stride2_parity():
    rng = np.random.default_rng(1)
    inp = 16
    x = rng.standard_normal((2, 8, 8, inp)).astype(np.float32)
    blk = SHBlock(features=32, stride=2)
    vs = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), [], True)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.standard_normal(v.shape).astype(np.float32) * 0.2
                              + np.asarray(v)), vs["params"])
    ours, _ = blk.apply({"params": params, "batch_stats": vs["batch_stats"]},
                        jnp.asarray(x), [], True, mutable=["batch_stats"])

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    # branch1: dw s2 -> bn -> pw -> bn -> relu
    b1 = F.conv2d(t, _conv_w(params, "b1_dw", "conv"), stride=2, padding=1,
                  groups=inp)
    b1 = _bn_torch(b1, params, "b1_dw", "bn")
    b1 = F.relu(_bn_torch(F.conv2d(b1, _conv_w(params, "b1_pw", "conv")),
                          params, "b1_pw", "bn"))
    # branch2: pw -> bn -> relu -> dw s2 -> bn -> pw -> bn -> relu
    b2 = F.relu(_bn_torch(F.conv2d(t, _conv_w(params, "b2_pw1", "conv")),
                          params, "b2_pw1", "bn"))
    b2 = F.conv2d(b2, _conv_w(params, "b2_dw", "conv"), stride=2, padding=1,
                  groups=16)
    b2 = _bn_torch(b2, params, "b2_dw", "bn")
    b2 = F.relu(_bn_torch(F.conv2d(b2, _conv_w(params, "b2_pw2", "conv")),
                          params, "b2_pw2", "bn"))
    out = torch.cat([b1, b2], 1)
    # channel shuffle groups=2
    b, c, h, w = out.shape
    out = out.view(b, 2, c // 2, h, w).transpose(1, 2).contiguous().view(b, c, h, w)
    ref = np.transpose(out.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_pointwise_conv_matches_conv2d_1x1():
    """PointwiseConv (the dot-lowered 1x1 used for final2) is bit-compatible
    with nn.Conv(kernel_size=(1,1)): same param pytree, same outputs, same
    grads — a checkpoint written against either loads into the other."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mrfp_tpu.nn.layers import PointwiseConv, conv2d, kaiming_fan_in

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 9, 11, 7)),
                    jnp.float32)
    pw = PointwiseConv(5, kernel_init=kaiming_fan_in)
    cv = conv2d(5, 1, bias=True, kernel_init=kaiming_fan_in)
    vp = pw.init(jax.random.PRNGKey(3), x)
    vc = cv.init(jax.random.PRNGKey(3), x)
    # identical param tree (same names, shapes, and — same init rngs — values)
    assert jax.tree.structure(vp) == jax.tree.structure(vc)
    for a, b in zip(jax.tree.leaves(vp), jax.tree.leaves(vc)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(pw.apply(vp, x), cv.apply(vp, x),
                               rtol=1e-6, atol=1e-6)
    gp = jax.grad(lambda v: jnp.sum(jnp.square(pw.apply(v, x))))(vp)
    gc = jax.grad(lambda v: jnp.sum(jnp.square(cv.apply(v, x))))(vp)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gc)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
