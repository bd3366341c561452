"""Fused dot+BN-stats kernel: values, stats, and gradients vs plain XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrfp_tpu.ops.pallas_dot_stats import dot_with_stats, _xla_fallback


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(256, 64, 256), (128, 256, 64),
                                   (512, 128, 128)])
def test_forward_matches_xla(dtype, shape):
    m, cin, cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, cin)), dtype)
    w = jnp.asarray(rng.standard_normal((cin, cout)) * 0.1, dtype)
    y, s1, s2 = dot_with_stats(x, w, True)  # interpret=True -> kernel on CPU
    yr, s1r, s2r = _xla_fallback(x, w)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yr, np.float32), rtol=tol, atol=tol)
    # stats are fp32 sums of the stored (rounded) y in both paths
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r),
                               rtol=1e-5, atol=1e-2)


def test_grads_match_unfused():
    """custom_vjp backward == autodiff of the unfused (dot, stats) graph,
    including cotangents flowing through s1/s2 (the BN-variance path)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 128)) * 0.1, jnp.float32)

    def fused(x, w):
        y, s1, s2 = dot_with_stats(x, w, True)
        # a loss touching all three outputs like BN does (mean + var use)
        return jnp.sum(y * y) + jnp.sum(jnp.sin(s1)) + jnp.sum(jnp.cos(s2))

    def unfused(x, w):
        y, s1, s2 = _xla_fallback(x, w)
        return jnp.sum(y * y) + jnp.sum(jnp.sin(s1)) + jnp.sum(jnp.cos(s2))

    gx_f, gw_f = jax.grad(fused, (0, 1))(x, w)
    gx_u, gw_u = jax.grad(unfused, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_u),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_u),
                               rtol=1e-4, atol=1e-4)


def test_fallback_on_ragged_m():
    x = jnp.ones((100, 32), jnp.float32)  # m=100 doesn't tile
    w = jnp.ones((32, 128), jnp.float32)
    y, s1, s2 = dot_with_stats(x, w)
    assert y.shape == (100, 128)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(y).sum(0), rtol=1e-6)
