"""Device confusion matrix == reference fast_hist (metrics.py:122-126)."""

import jax
import jax.numpy as jnp
import numpy as np

from mrfp_tpu.ops.hist import confusion_matrix_update, fast_hist


def test_matches_numpy_reference():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 19, size=(3, 64, 64))
    label = rng.integers(0, 20, size=(3, 64, 64))
    label[label == 19] = 255  # ignore pixels
    ref = fast_hist(pred, label, 19)

    hist = jnp.zeros((19, 19), jnp.int32)
    got = jax.jit(confusion_matrix_update, static_argnums=3)(
        hist, jnp.asarray(pred), jnp.asarray(label), 19)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_accumulates():
    rng = np.random.default_rng(1)
    hist = jnp.zeros((19, 19), jnp.int32)
    total = np.zeros((19, 19), np.int64)
    for i in range(3):
        pred = rng.integers(0, 19, size=(32, 32))
        label = rng.integers(0, 19, size=(32, 32))
        hist = confusion_matrix_update(hist, jnp.asarray(pred), jnp.asarray(label), 19)
        total += fast_hist(pred, label, 19)
    np.testing.assert_array_equal(np.asarray(hist), total)
