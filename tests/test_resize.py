"""Parity of resize ops vs torch F.interpolate (the reference's primitives).

Covers the exact call patterns the reference uses:
- mynn.Upsample: bilinear align_corners=True with size= (mynn.py:114-119)
- OC branch: nearest (default mode) with scale_factor= and with size=
  (deepv3.py:320-327)
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mrfp_tpu.ops.resize import (
    nearest_out_size,
    resize_bilinear_align_corners,
    resize_nearest,
)


def _rand(n, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, h, w, c)).astype(np.float32)


def _to_torch(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_torch(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


# the exact scale factors used by the OC branch
OC_SCALES = [1.205, 1.2, 0.838, 0.798]


@pytest.mark.parametrize("scale", OC_SCALES)
@pytest.mark.parametrize("hw", [(48, 48), (33, 57), (192, 192)])
def test_nearest_scale_factor(scale, hw):
    x = _rand(2, *hw, 5)
    ours = np.asarray(resize_nearest(jnp.asarray(x), scale=(scale, scale)))
    ref = _from_torch(F.interpolate(_to_torch(x), scale_factor=(scale, scale)))
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)
    assert ours.shape[1:3] == nearest_out_size(hw, (scale, scale))


@pytest.mark.parametrize("hw,out", [((48, 48), (24, 24)), ((77, 41), (38, 20)),
                                    ((30, 30), (48, 48)), ((231, 231), (384, 384))])
def test_nearest_size(hw, out):
    x = _rand(1, *hw, 3)
    ours = np.asarray(resize_nearest(jnp.asarray(x), size=out))
    ref = _from_torch(F.interpolate(_to_torch(x), size=out))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("hw,out", [((12, 12), (48, 48)), ((48, 48), (13, 29)),
                                    ((7, 9), (100, 50)), ((1, 1), (16, 16)),
                                    ((24, 24), (24, 24))])
def test_bilinear_align_corners(hw, out):
    x = _rand(2, *hw, 4)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out))
    ref = _from_torch(F.interpolate(_to_torch(x), size=out, mode="bilinear",
                                    align_corners=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("hw,out", [((48, 48), (24, 24)), ((33, 57), (40, 69))])
def test_matmul_impl_identical_nearest(hw, out):
    x = _rand(2, *hw, 5)
    g = resize_nearest(jnp.asarray(x), size=out, impl="gather")
    m = resize_nearest(jnp.asarray(x), size=out, impl="matmul")
    np.testing.assert_array_equal(np.asarray(g), np.asarray(m))


@pytest.mark.parametrize("hw,out", [((12, 12), (48, 48)), ((48, 48), (13, 29))])
def test_matmul_impl_identical_bilinear(hw, out):
    x = _rand(2, *hw, 4)
    g = resize_bilinear_align_corners(jnp.asarray(x), out, impl="gather")
    m = resize_bilinear_align_corners(jnp.asarray(x), out, impl="matmul")
    np.testing.assert_allclose(np.asarray(g), np.asarray(m), atol=1e-6)


def test_matmul_impl_identical_bf16():
    x = jnp.asarray(_rand(1, 24, 24, 8)).astype(jnp.bfloat16)
    g = resize_nearest(x, scale=(1.205, 1.205), impl="gather")
    m = resize_nearest(x, scale=(1.205, 1.205), impl="matmul")
    np.testing.assert_array_equal(np.asarray(g.astype(jnp.float32)),
                                  np.asarray(m.astype(jnp.float32)))


def test_oc_chain_sizes_768():
    """The full OC size chain for a 768x768 input (deepv3.py:320-327)."""
    h = w = 768
    s = (192, 192)  # stem output H/4
    sizes = [s]
    for sc in (1.205, 1.2, 1.2):
        sizes.append(nearest_out_size(sizes[-1], (sc, sc)))
    assert sizes[1:] == [(231, 231), (277, 277), (332, 332)]
    # enc4 -> (h/2, w/2); dec chain
    half = (h // 2, w // 2)
    d1 = nearest_out_size(half, (0.838, 0.838))
    d2 = nearest_out_size(d1, (0.798, 0.798))
    assert half == (384, 384) and d1 == (321, 321) and d2 == (256, 256)


def test_conv7x7_s2d_reparam_is_exact():
    """Space-to-depth stem conv (nn/layers.Conv7x7S2D) computes the exact
    7x7/s2/p3 conv: same param layout, same products, MXU-friendly shape;
    odd sizes fall back to the direct conv."""
    import jax
    import jax.numpy as jnp
    from mrfp_tpu.nn.layers import Conv7x7S2D, conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)), jnp.float32)
    m = Conv7x7S2D(64)
    v = m.init(jax.random.PRNGKey(0), x)
    direct = conv2d(64, 7, 2, 3).apply(
        {"params": {"kernel": v["params"]["kernel"]}}, x)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)
    x_odd = jnp.asarray(rng.standard_normal((1, 63, 96, 3)), jnp.float32)
    direct_odd = conv2d(64, 7, 2, 3).apply(
        {"params": {"kernel": v["params"]["kernel"]}}, x_odd)
    np.testing.assert_array_equal(np.asarray(m.apply(v, x_odd)),
                                  np.asarray(direct_odd))


def test_pallas_kernels_disabled_context(monkeypatch):
    """Multi-device traces route resizes away from pallas_call (GSPMD can't
    partition custom calls); the context flips both fused routes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import mrfp_tpu.ops.resize as rz
    import mrfp_tpu.ops.pallas_resize as pr

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 64)),
                    jnp.float32)
    called = []
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pr, "resize_nearest_fused",
                        lambda v, iy, ix: called.append("nearest") or
                        jnp.zeros((v.shape[0], len(iy), len(ix), v.shape[3]),
                                  v.dtype))
    monkeypatch.setattr(pr, "resize_bilinear_fused",
                        lambda v, th, tw: called.append("bilinear") or
                        jnp.zeros((v.shape[0], len(th[0][0]), len(tw[0][0]),
                                   v.shape[3]), v.dtype))

    # outside the context (fake-TPU): the fused routes are taken
    rz.resize_nearest(x, size=(4, 4), impl="fused")
    rz.resize_bilinear_align_corners(x, (16, 16))
    assert called == ["nearest", "bilinear"]

    # inside: both fall back to the shardable einsum forms
    called.clear()
    with rz.pallas_kernels_disabled():
        a = rz.resize_nearest(x, size=(4, 4), impl="fused")
        b = rz.resize_bilinear_align_corners(x, (16, 16))
    assert called == []
    np.testing.assert_allclose(
        a, rz.resize_nearest(x, size=(4, 4), impl="gather"), atol=1e-6)
    np.testing.assert_allclose(
        b, rz.resize_bilinear_align_corners(x, (16, 16), impl="gather"),
        rtol=1e-5, atol=1e-5)
