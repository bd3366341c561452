"""Tensor (model) parallelism: channel-sharded params over the mesh 'model'
axis.

The reference has no TP (SURVEY.md §2.3 — CNN, single-node NCCL); this is a
TPU-native extension: conv kernels shard their output-feature dim, BN
scale/bias/stats and the optimizer momentum mirror shard with them
(core/mesh.py state_shardings), and GSPMD propagates/reshards through the
step. Value = memory: params + momentum are no longer replicated per chip
(WiderResNet38-scale trunks, bigger activations headroom), paid for with
channel collectives on ICI.

Pinned here on the 8-virtual-device CPU mesh: (a) the FULL MRFP+ train step
under dp x tp is loss-invariant vs 1 device, (b) params really are sharded
(per-device bytes shrink), (c) eval logits match the unsharded forward,
(d) TP composes with spatial sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrfp_tpu.core.config import Config, MeshConfig
from mrfp_tpu.core.mesh import (batch_sharding, create_mesh, shard_batch,
                                shard_state, state_shardings)
from mrfp_tpu.models import MRFP
from mrfp_tpu.perturb import oc_init
from mrfp_tpu.train import create_train_state, make_jitted_steps

HW = 64


def _step_loss_and_state(model, cfg, images, labels, mesh_cfg, n_dev):
    mesh = create_mesh(mesh_cfg, jax.devices()[:n_dev])
    state = create_train_state(model, cfg.train, (1, HW, HW, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    state = shard_state(mesh, state)
    imgs, lbls = shard_batch(mesh, (images, labels))
    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    new_state, metrics = jtrain(state, imgs, lbls)
    return float(metrics["loss"]), new_state


@pytest.mark.slow
@pytest.mark.parametrize("dp,mp", [(1, 4), (2, 2)])
def test_tp_train_step_loss_invariant(dp, mp):
    """dp x tp sharded full MRFP+ train step == 1-device loss."""
    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    rng = np.random.default_rng(0)
    batch = 2 * dp
    images = rng.standard_normal((batch, HW, HW, 3)).astype(np.float32)
    labels = rng.integers(0, 19, (batch, HW, HW)).astype(np.int32)

    loss_tp, state_tp = _step_loss_and_state(
        model, cfg, images, labels,
        MeshConfig(data_parallel=dp, model_parallel=mp), dp * mp)
    loss_1, state_1 = _step_loss_and_state(
        model, cfg, images, labels, MeshConfig(), 1)
    assert np.isfinite(loss_tp)
    assert abs(loss_tp - loss_1) <= 1e-4 * max(1.0, abs(loss_1)), (
        f"{dp}x{mp} loss {loss_tp!r} vs 1-dev {loss_1!r}")

    # the UPDATED params agree too (grads + optimizer under TP == 1-dev)
    flat_tp = jax.tree_util.tree_leaves(state_tp.params)
    flat_1 = jax.tree_util.tree_leaves(state_1.params)
    worst = max(float(np.max(np.abs(np.asarray(a, np.float32)
                                    - np.asarray(b, np.float32))))
                for a, b in zip(flat_tp, flat_1))
    # channel-sharded BN-stat/grad reductions reassociate the f32 sums;
    # measured ~1e-3 worst-case on the lr=1e-2 update (same order as the
    # scan-vs-separate-jit noise documented for gradient accumulation)
    assert worst <= 3e-3, f"params diverge under TP: max |d|={worst}"


def test_tp_params_actually_sharded():
    """Channel tensors land sharded: per-device bytes < full bytes, and the
    momentum mirror shards identically to its param."""
    mesh = create_mesh(MeshConfig(data_parallel=1, model_parallel=4),
                       jax.devices()[:4])
    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    state = create_train_state(model, cfg.train, (1, HW, HW, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    sharded = shard_state(mesh, state)

    kernels = [x for x in jax.tree_util.tree_leaves(sharded.params)
               if x.ndim == 4 and x.shape[-1] % 4 == 0]
    assert kernels, "no shardable conv kernels found"
    for k in kernels:
        shard = k.addressable_shards[0].data
        assert shard.shape[-1] * 4 == k.shape[-1], (k.shape, shard.shape)

    # momentum mirrors the param shardings (same shapes -> same rule)
    specs = state_shardings(mesh, state)
    p_leaves = jax.tree_util.tree_leaves(
        specs.params, is_leaf=lambda x: x is None)
    m_leaves = jax.tree_util.tree_leaves(
        specs.opt_state, is_leaf=lambda x: x is None)
    assert any(s.spec != jax.sharding.PartitionSpec() for s in p_leaves)
    assert any(s.spec != jax.sharding.PartitionSpec() for s in m_leaves)

    # OC params (frozen, in-graph resampled) stay replicated by design
    for s in jax.tree_util.tree_leaves(specs.oc_params,
                                       is_leaf=lambda x: x is None):
        assert s.spec == jax.sharding.PartitionSpec()


def test_tp_eval_logits_match_unsharded():
    """Eval forward with params channel-sharded 4-way equals the unsharded
    apply (same protocol as the spatial test)."""
    model = MRFP(trunk="resnet-18", variant="D32")
    x = np.random.default_rng(3).standard_normal((2, HW, HW, 3)).astype(
        np.float32)
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.PRNGKey(0), jnp.asarray(x))

    ref = jax.jit(lambda v, x: model.apply(v, x, train=False, mutable=False)
                  )(variables, jnp.asarray(x))["logits"]

    mesh = create_mesh(MeshConfig(data_parallel=1, model_parallel=4),
                       jax.devices()[:4])
    vs = shard_state(mesh, variables)
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh, 4))
    out = jax.jit(
        lambda v, x: model.apply(v, x, train=False, mutable=False)
    )(vs, xs)["logits"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_tp_composes_with_spatial():
    """dp1 x mp2 x sp2: tensor + spatial sharding in one program stays
    loss-invariant."""
    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    rng = np.random.default_rng(7)
    images = rng.standard_normal((2, HW, HW, 3)).astype(np.float32)
    labels = rng.integers(0, 19, (2, HW, HW)).astype(np.int32)

    loss_tp, _ = _step_loss_and_state(
        model, cfg, images, labels,
        MeshConfig(data_parallel=1, model_parallel=2, spatial_parallel=2), 4)
    loss_1, _ = _step_loss_and_state(
        model, cfg, images, labels, MeshConfig(), 1)
    assert abs(loss_tp - loss_1) <= 1e-4 * max(1.0, abs(loss_1)), (
        f"mp2xsp2 loss {loss_tp!r} vs 1-dev {loss_1!r}")
