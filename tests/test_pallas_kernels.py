"""Pallas kernels vs their jnp references (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrfp_tpu.ops.hist import fast_hist
from mrfp_tpu.ops.pallas_hist import confusion_matrix_pallas
from mrfp_tpu.ops.pallas_np_plus import normalization_perturbation_plus_pallas
from mrfp_tpu.perturb.np_plus import normalization_perturbation_plus


def test_pallas_hist_matches_reference():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 19, size=(3, 50, 70))
    label = rng.integers(0, 21, size=(3, 50, 70))
    label[label >= 19] = 255
    ref = fast_hist(pred, label, 19)
    got = confusion_matrix_pallas(jnp.asarray(pred), jnp.asarray(label), 19,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_pallas_hist_small_input_padding():
    pred = jnp.asarray([0, 1, 2, 18])
    label = jnp.asarray([0, 1, 3, 18])
    got = confusion_matrix_pallas(pred, label, 19, interpret=True)
    ref = fast_hist(np.asarray(pred), np.asarray(label), 19)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_pallas_np_plus_matches_jnp():
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.standard_normal((4, 16, 16, 8)), jnp.float32)
    key = jax.random.PRNGKey(3)
    ref = normalization_perturbation_plus(key, feat)
    got = normalization_perturbation_plus_pallas(key, feat, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_np_plus_nondivisible_height():
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.standard_normal((2, 25, 16, 8)), jnp.float32)
    key = jax.random.PRNGKey(4)
    ref = normalization_perturbation_plus(key, feat)
    got = normalization_perturbation_plus_pallas(key, feat, block_h=16,
                                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


class TestPallasChannelSums:
    """ops/pallas_stats.py — the verified-but-not-faster stats kernel."""

    @pytest.mark.parametrize("shape", [(4, 32, 32, 64), (2, 16, 16, 256),
                                       (4, 16, 16, 48), (8, 16, 16, 19)])
    def test_matches_jnp(self, shape):
        from mrfp_tpu.ops import pallas_stats as ps
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(shape), jnp.float32)
        assert ps._supported(x)
        s1p, s2p = ps._channel_sums_pallas(x, interpret=True)
        s1r, s2r = ps._channel_sums_jnp(x)
        np.testing.assert_allclose(s1p, s1r, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(s2p, s2r, rtol=1e-5, atol=1e-4)

    def test_channel_stats_and_grad(self):
        from mrfp_tpu.ops.pallas_stats import channel_stats

        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 8, 8, 16)),
            jnp.float32)

        def loss(x):
            m, v = channel_stats(x)
            return jnp.sum(m * 2.0) + jnp.sum(v * 3.0)

        def loss_ref(x):
            m = jnp.mean(x, axis=(0, 1, 2))
            v = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(m)
            return jnp.sum(m * 2.0) + jnp.sum(v * 3.0)

        np.testing.assert_allclose(loss(x), loss_ref(x), rtol=1e-6)
        np.testing.assert_allclose(jax.grad(loss)(x), jax.grad(loss_ref)(x),
                                   rtol=1e-5, atol=1e-6)
