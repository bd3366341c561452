"""Layout-preserving Pallas resize kernel vs jnp.take (interpret mode on CPU).

The kernel replaces the XLA einsum form of the one-hot nearest resize in the
OC branch (reference deepv3.py:320-327), whose spatial-dim contraction made
XLA relayout every operand W-minor (~16 GB of transpose copies per train
step). Values must be bit-identical to a plain gather in both directions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrfp_tpu.ops.pallas_resize import row_mix_pallas, take_rows
from mrfp_tpu.ops.resize import (_nearest_idx_from_scale,
                                 _nearest_idx_from_size, resize_nearest)

CASES = [
    (1, 1.205, jnp.float32),   # OC encoder upsample, H
    (2, 1.205, jnp.bfloat16),  # OC encoder upsample, W, train dtype
    (1, 0.798, jnp.float32),   # OC decoder downsample, H
    (2, 0.838, jnp.bfloat16),  # OC decoder downsample, W
]


@pytest.mark.parametrize("axis,scale,dtype", CASES)
def test_take_rows_forward_bitexact(axis, scale, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 8)), dtype)
    idx = tuple(int(i) for i in _nearest_idx_from_scale(x.shape[axis], scale))
    got = take_rows(x, idx, axis, interpret=True)
    ref = jnp.take(x, jnp.asarray(idx), axis=axis)
    assert got.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


@pytest.mark.parametrize("axis,scale,dtype", CASES)
def test_take_rows_grad_matches_gather(axis, scale, dtype):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 8)), dtype)
    idx = tuple(int(i) for i in _nearest_idx_from_scale(x.shape[axis], scale))
    g = jnp.asarray(rng.standard_normal(
        tuple(len(idx) if a == axis else s for a, s in enumerate(x.shape))),
        dtype)

    def f(x):
        return jnp.vdot(take_rows(x, idx, axis, interpret=True)
                        .astype(jnp.float32), g.astype(jnp.float32))

    def fr(x):
        return jnp.vdot(jnp.take(x, jnp.asarray(idx), axis=axis)
                        .astype(jnp.float32), g.astype(jnp.float32))

    gx = np.asarray(jax.grad(f)(x), np.float32)
    gr = np.asarray(jax.grad(fr)(x), np.float32)
    np.testing.assert_array_equal(gx, gr)


def test_take_rows_size_rule_and_small_channel_fallback():
    # wc < 128 falls back to the einsum path inside row_mix_pallas
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 9, 5, 4)), jnp.float32)
    idx = tuple(int(i) for i in _nearest_idx_from_size(9, 13))
    got = take_rows(x, idx, 1, interpret=True)
    ref = jnp.take(x, jnp.asarray(idx), axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_row_mix_general_matrix():
    # dense (non-one-hot) mixes are supported too (bilinear-style taps)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    P = rng.standard_normal((11, 16)).astype(np.float32)
    got = row_mix_pallas(x, P, 1, interpret=True)
    ref = jnp.einsum("oh,nhwc->nowc", jnp.asarray(P), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    got = row_mix_pallas(x, P, 2, interpret=True)
    ref = jnp.einsum("ow,nhwc->nhoc", jnp.asarray(P), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_nearest_matches_gather():
    from mrfp_tpu.ops.pallas_resize import resize_nearest_fused
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 8)), jnp.float32)
    iy = tuple(int(i) for i in _nearest_idx_from_scale(24, 1.205))
    ix = tuple(int(i) for i in _nearest_idx_from_scale(20, 1.205))
    got = resize_nearest_fused(x, iy, ix, True)
    ref = jnp.take(jnp.take(x, jnp.asarray(iy), 1), jnp.asarray(ix), 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # grad: multiplicity-decomposed transpose == scatter-add adjoint
    g = jnp.asarray(rng.standard_normal(got.shape), jnp.float32)

    def f(x):
        return jnp.vdot(resize_nearest_fused(x, iy, ix, True), g)

    def fr(x):
        return jnp.vdot(
            jnp.take(jnp.take(x, jnp.asarray(iy), 1), jnp.asarray(ix), 2), g)

    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(fr)(x)), atol=1e-5)


def test_fused_bilinear_matches_two_tap():
    from mrfp_tpu.ops.pallas_resize import resize_bilinear_fused
    from mrfp_tpu.ops.resize import _bilinear_taps, resize_bilinear_align_corners
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 8)), jnp.float32)
    for size in [(48, 40), (17, 15), (24, 31)]:
        got = resize_bilinear_fused(x, _bilinear_taps(24, size[0]),
                                    _bilinear_taps(20, size[1]), True)
        ref = resize_bilinear_align_corners(x, size, impl="gather")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-6, rtol=2e-6)
        g = jnp.asarray(rng.standard_normal(got.shape), jnp.float32)

        def f(x):
            return jnp.vdot(resize_bilinear_fused(
                x, _bilinear_taps(24, size[0]), _bilinear_taps(20, size[1]),
                True), g)

        def fr(x):
            return jnp.vdot(
                resize_bilinear_align_corners(x, size, impl="gather"), g)

        np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                                   np.asarray(jax.grad(fr)(x)),
                                   atol=2e-5, rtol=2e-5)


def test_resize_nearest_impls_agree():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 8)), jnp.float32)
    a = resize_nearest(x, scale=(1.205, 0.798), impl="gather")
    b = resize_nearest(x, scale=(1.205, 0.798), impl="matmul")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
