"""Orbax checkpoint round-trip: full TrainState incl. OC params and RNG key."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from mrfp_tpu.core.config import Config
from mrfp_tpu.models import MRFP
from mrfp_tpu.perturb import oc_init
from mrfp_tpu.train import create_train_state
from mrfp_tpu.train.checkpoint import CheckpointManager


def test_save_restore_roundtrip():
    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    state = create_train_state(model, cfg.train, (1, 32, 32, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, keep=2)
        mgr.save(state)
        mgr.wait()
        assert mgr.latest_step() == 7

        template = create_train_state(model, cfg.train, (1, 32, 32, 3),
                                      oc_params=oc_init(jax.random.PRNGKey(2)),
                                      seed=99)
        restored = mgr.restore(template)
        mgr.close()

    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.base_key),
                                  np.asarray(state.base_key))
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(restored.oc_params["enc1"]["kernel"]),
        np.asarray(state.oc_params["enc1"]["kernel"]))


def test_restore_none_when_empty():
    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    state = create_train_state(model, cfg.train, (1, 32, 32, 3))
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        assert mgr.restore(state) is None
        mgr.close()
