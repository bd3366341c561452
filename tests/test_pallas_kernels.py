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
