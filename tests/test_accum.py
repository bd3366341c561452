"""Gradient accumulation (TrainConfig.accum_steps): N sequential microbatches
inside one jit step.

Semantics pinned here: grads = mean of the microbatch mean-grads (the DDP
gradient-average rule the reference relies on via torch DDP), BN running
stats take N sequential EMA updates (what N torch forwards would do), and the
microbatch split is mb-major (image i -> microbatch i % N) so each device
scans over its own batch shard.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrfp_tpu.core.config import Config
from mrfp_tpu.core.rng import step_keys
from mrfp_tpu.models import MRFP
from mrfp_tpu.train import create_train_state
from mrfp_tpu.train.losses import cross_entropy
from mrfp_tpu.train.state import make_optimizer
from mrfp_tpu.train.step import train_step

HW = 32


def _data(batch):
    rng = np.random.default_rng(5)
    images = rng.standard_normal((batch, HW, HW, 3)).astype(np.float32)
    labels = rng.integers(0, 19, (batch, HW, HW)).astype(np.int32)
    return jnp.asarray(images), jnp.asarray(labels)


def test_accum_matches_hand_rolled_sequential_forwards():
    """accum_steps=2 == two explicit fwd/bwd passes: same loss, same updated
    params (optimizer applied to the mean grad), same final batch_stats.

    IW layers are disabled: their Newton-Schulz whitening amplifies the
    scan-vs-separate-jit fp reassociation noise from ~1e-7 to ~1e-3 on the
    huge early-layer grads, which would drown the algebra being tested (the
    full-default path is covered by the smoke test below)."""
    cfg = Config()
    cfg = cfg.replace(perturb=dataclasses.replace(cfg.perturb, enabled=False),
                      train=dataclasses.replace(cfg.train, accum_steps=2))
    model = MRFP(trunk="resnet-18", variant="D32", wt_layer=(0,) * 7)
    state = create_train_state(model, cfg.train, (1, HW, HW, 3))
    images, labels = _data(4)

    new_state, metrics = jax.jit(
        lambda s, i, l: train_step(s, i, l, model=model, cfg=cfg))(
            state, images, labels)

    # hand-rolled reference: microbatch i%2, sequential batch_stats,
    # per-microbatch folded dropout key, mean-of-means grads
    keys = step_keys(state.base_key, state.step)

    def fwd(params, stats, im, lb, i):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, im, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(keys["dropout"], i)})
        return (cross_entropy(out["logits"], lb, cfg.data.ignore_index),
                mut["batch_stats"])

    grad_fn = jax.jit(jax.value_and_grad(fwd, has_aux=True),
                      static_argnames=())
    (l0, stats1), g0 = grad_fn(state.params, state.batch_stats,
                               images[0::2], labels[0::2], 0)
    (l1, stats2), g1 = grad_fn(state.params, stats1,
                               images[1::2], labels[1::2], 1)
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)
    loss = (l0 + l1) / 2

    np.testing.assert_allclose(float(metrics["loss"]), float(loss),
                               rtol=1e-6)
    tx = make_optimizer(cfg.train)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    want = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    # scan-vs-separate-jit compilations reassociate the conv backward sums;
    # the observed grad noise is ~3e-5 RELATIVE TO THE GRAD, which on this
    # random-init task (stem grads ~4e3) is large in absolute terms. Assert
    # each leaf agrees to 0.1% of the step it took — the algebra, not the
    # fp schedule. (batch_stats come from the forward and match bitwise.)
    upd_leaves = jax.tree_util.tree_leaves(updates)
    for (path, a), b, u in zip(jax.tree_util.tree_leaves_with_path(want),
                               jax.tree_util.tree_leaves(new_state.params),
                               upd_leaves):
        tol = 1e-3 * float(np.max(np.abs(np.asarray(u)))) + 1e-7
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0,
                                   atol=tol,
                                   err_msg=jax.tree_util.keystr(path))
    for a, b in zip(jax.tree_util.tree_leaves(stats2),
                    jax.tree_util.tree_leaves(new_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)


def test_accum_full_mrfp_plus_runs_and_is_finite():
    """The full perturbation path (gates, OC resample, NP+ noise folded per
    microbatch) compiles and runs under accum_steps=2."""
    from mrfp_tpu.perturb import oc_init

    cfg = Config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=2))
    model = MRFP(trunk="resnet-18", variant="D32")
    state = create_train_state(model, cfg.train, (1, HW, HW, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    images, labels = _data(4)
    new_state, metrics = jax.jit(
        lambda s, i, l: train_step(s, i, l, model=model, cfg=cfg))(
            state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_accum_composes_with_spatial_mesh():
    """accum_steps=2 under a dp2 x sp2 mesh: the mb-major split keeps each
    device scanning its own batch shard, and the loss stays device-count
    invariant vs the unsharded accum step."""
    from mrfp_tpu.core.config import MeshConfig
    from mrfp_tpu.core.mesh import create_mesh, shard_batch
    from mrfp_tpu.train import make_jitted_steps

    cfg = Config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=2))
    model = MRFP(trunk="resnet-18", variant="D32", wt_layer=(0,) * 7)
    images, labels = _data(8)

    def run(mesh_cfg, n_dev):
        mesh = create_mesh(mesh_cfg, jax.devices()[:n_dev])
        state = create_train_state(model, cfg.train, (1, HW, HW, 3))
        state = jax.device_put(state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        imgs, lbls = shard_batch(mesh, (images, labels))
        jtrain, _ = make_jitted_steps(model, cfg, mesh)
        _, m = jtrain(state, imgs, lbls)
        return float(m["loss"])

    loss_sp = run(MeshConfig(data_parallel=2, spatial_parallel=2), 4)
    loss_1 = run(MeshConfig(), 1)
    assert np.isfinite(loss_sp)
    assert abs(loss_sp - loss_1) <= 1e-4 * max(1.0, abs(loss_1)), (
        loss_sp, loss_1)


def test_accum_rejects_indivisible_batch():
    cfg = Config()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=3))
    model = MRFP(trunk="resnet-18", variant="D32")
    state = create_train_state(model, cfg.train, (1, HW, HW, 3))
    images, labels = _data(4)
    with pytest.raises(ValueError, match="not divisible"):
        train_step(state, images, labels, model=model, cfg=cfg)
