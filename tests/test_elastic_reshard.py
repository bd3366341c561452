"""Elastic topology change through the checkpoint: train under one mesh,
restore the Orbax checkpoint under a DIFFERENT mesh, and keep training.

The production move this pins down: a run starts data-parallel, gets
preempted, and resumes on a different slice shape (fewer chips, or with
tensor/spatial sharding turned on for memory headroom). The reference
cannot do this at all — its torch checkpoints are rank-0 state_dicts tied
to the DDP world it saved from (main.py:867-869). Here the checkpoint is
topology-free by construction: Orbax StandardRestore materializes each
leaf into the TEMPLATE's sharding, so the restoring run just commits its
own mesh placement (core/mesh.py shard_state) and GSPMD does the rest.

Pinned on the 8-virtual-device CPU mesh: dp4 -> {1-device, dp2 x sp2,
dp2 x tp2} all restore bit-identically and continue with the same loss the
original topology would have produced (up to the documented channel-
reduction reassociation noise under TP)."""

import jax
import numpy as np
import pytest

from mrfp_tpu.core.config import Config, MeshConfig
from mrfp_tpu.core.mesh import (create_mesh, shard_batch, shard_state,
                                state_shardings)
from mrfp_tpu.models import MRFP
from mrfp_tpu.perturb import oc_init
from mrfp_tpu.train import create_train_state, make_jitted_steps
from mrfp_tpu.train.checkpoint import CheckpointManager

HW = 64


def _fresh_state(model, cfg):
    return create_train_state(model, cfg.train, (1, HW, HW, 3),
                              oc_params=oc_init(jax.random.PRNGKey(1)))


def _mesh(mesh_cfg, n_dev):
    return create_mesh(mesh_cfg, jax.devices()[:n_dev])


def _one_step(model, cfg, mesh, state, images, labels):
    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    imgs, lbls = shard_batch(mesh, (images, labels))
    state, metrics = jtrain(state, imgs, lbls)
    return state, float(metrics["loss"])


@pytest.mark.slow
@pytest.mark.parametrize("name,mesh_cfg,n_dev,tol", [
    ("single", MeshConfig(), 1, 1e-3),
    ("dp2xsp2", MeshConfig(data_parallel=2, spatial_parallel=2), 4, 1e-3),
    # channel-sharded reductions reassociate f32 sums (~1e-3 on updates,
    # tests/test_tensor_parallel.py) — same budget here
    ("dp2xtp2", MeshConfig(data_parallel=2, model_parallel=2), 4, 3e-3),
])
def test_restore_onto_different_mesh(tmp_path, name, mesh_cfg, n_dev, tol):
    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    rng = np.random.default_rng(0)
    images = rng.standard_normal((4, HW, HW, 3)).astype(np.float32)
    labels = rng.integers(0, 19, (4, HW, HW)).astype(np.int32)

    # train one dp4 step, checkpoint it
    mesh_a = _mesh(MeshConfig(data_parallel=4), 4)
    state = shard_state(mesh_a, _fresh_state(model, cfg))
    state, _ = _one_step(model, cfg, mesh_a, state, images, labels)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(state)
    ckpt.wait()
    # host snapshot for the bit-compare below: the reference-continuation
    # step donates (deletes) state's buffers
    saved_params = jax.tree_util.tree_map(
        lambda x: np.asarray(x), state.params)

    # reference continuation on the ORIGINAL topology
    _, loss_ref = _one_step(model, cfg, mesh_a, state, images, labels)

    # elastic continuation: restore the same checkpoint onto mesh B
    mesh_b = _mesh(mesh_cfg, n_dev)
    template = shard_state(mesh_b, _fresh_state(model, cfg))
    ckpt_b = CheckpointManager(str(tmp_path / "ckpt"))
    restored = ckpt_b.restore(template)
    assert restored is not None and int(restored.step) == 1

    # the restore is bit-identical (a reshard moves bytes, never math) ...
    for a, b in zip(jax.tree_util.tree_leaves(saved_params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # ... lands in mesh B's committed placement ...
    want = state_shardings(mesh_b, template)
    for leaf, sh in zip(jax.tree_util.tree_leaves(restored),
                        jax.tree_util.tree_leaves(
                            want, is_leaf=lambda s: hasattr(s, "spec"))):
        assert leaf.sharding.is_equivalent_to(sh, np.ndim(leaf)), (
            f"{name}: restored leaf sharding {leaf.sharding} != {sh}")

    # ... and the continued step matches the original-topology trajectory
    _, loss_b = _one_step(model, cfg, mesh_b, restored, images, labels)
    assert abs(loss_b - loss_ref) <= tol * max(1.0, abs(loss_ref)), (
        f"{name}: continued loss {loss_b!r} vs original-mesh {loss_ref!r}")
