"""Spatial partitioning: image H sharded over the mesh 'spatial' axis.

The TPU-native answer to resolutions whose activations exceed one chip's HBM
(the reference's only big-image tool is sliding-window eval,
/root/reference/main.py:876-913): shard H across chips and let GSPMD insert
the conv halo exchanges. These tests pin down, on the 8-virtual-device CPU
mesh, that (a) the FULL MRFP+ train step compiles and runs under dp x sp
sharding with a device-count-invariant loss, and (b) spatially sharded eval
logits equal the unsharded forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrfp_tpu.core.config import Config, MeshConfig
from mrfp_tpu.core.mesh import batch_sharding, create_mesh, shard_batch
from mrfp_tpu.models import MRFP
from mrfp_tpu.perturb import oc_init
from mrfp_tpu.train import create_train_state, make_jitted_steps

HW = 64


def _one_loss(model, cfg, images, labels, mesh_cfg, n_dev):
    mesh = create_mesh(mesh_cfg, jax.devices()[:n_dev])
    state = create_train_state(model, cfg.train, (1, HW, HW, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    imgs, lbls = shard_batch(mesh, (images, labels))
    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    _, metrics = jtrain(state, imgs, lbls)
    return float(metrics["loss"])


@pytest.mark.parametrize("dp,sp", [
    pytest.param(2, 2, marks=pytest.mark.slow),  # 108 s; the pure-sp
    # case below keeps halo-exchange coverage fast, and the driver's
    # dryrun executes the dp-x-sp leg every round
    (1, 4)])
def test_spatial_train_step_loss_invariant(dp, sp):
    """dp x sp sharded full MRFP+ train step == 1-device loss.

    SyncBN / NP+ moments and the CE mean must reduce over (data x spatial);
    conv halos must reconstruct the unsharded receptive fields.
    """
    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    rng = np.random.default_rng(0)
    batch = 2 * dp
    images = rng.standard_normal((batch, HW, HW, 3)).astype(np.float32)
    labels = rng.integers(0, 19, (batch, HW, HW)).astype(np.int32)

    loss_sp = _one_loss(model, cfg, images, labels,
                        MeshConfig(data_parallel=dp, spatial_parallel=sp),
                        dp * sp)
    loss_1 = _one_loss(model, cfg, images, labels, MeshConfig(), 1)
    assert np.isfinite(loss_sp)
    assert abs(loss_sp - loss_1) <= 1e-4 * max(1.0, abs(loss_1)), (
        f"{dp}x{sp} loss {loss_sp!r} vs 1-dev {loss_1!r}")


def test_spatial_eval_logits_match_unsharded():
    """Eval forward with H sharded 4-way: logits equal the unsharded apply."""
    model = MRFP(trunk="resnet-18", variant="D32")
    x = np.random.default_rng(3).standard_normal((2, HW, HW, 3)).astype(
        np.float32)
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.PRNGKey(0), jnp.asarray(x))

    ref = jax.jit(lambda v, x: model.apply(v, x, train=False, mutable=False)
                  )(variables, jnp.asarray(x))["logits"]

    mesh = create_mesh(MeshConfig(data_parallel=2, spatial_parallel=4))
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh, 4))
    vs = jax.device_put(variables, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    out = jax.jit(
        lambda v, x: model.apply(v, x, train=False, mutable=False),
        in_shardings=(jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()), batch_sharding(mesh, 4)),
    )(vs, xs)["logits"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_meshed_evaluator_hist_matches_single_device():
    """SegEvaluator(mesh=...) — one image spatially sharded across 4 chips —
    accumulates the same confusion matrix as the single-device evaluator."""
    from mrfp_tpu.data.datasets import SyntheticDataset
    from mrfp_tpu.train.evaluator import SegEvaluator

    model = MRFP(trunk="resnet-18", variant="D32")
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.PRNGKey(0), x)
    params, stats = variables["params"], variables.get("batch_stats", {})
    val = SyntheticDataset(length=3, hw=(HW, HW), seed=11)
    quiet = lambda *a, **k: None

    ref = SegEvaluator(model, params, stats).run(val, log=quiet)
    mesh = create_mesh(MeshConfig(data_parallel=1, spatial_parallel=4),
                       jax.devices()[:4])
    got = SegEvaluator(model, params, stats, mesh=mesh).run(val, log=quiet)
    assert np.array_equal(got["hist"], ref["hist"])
    assert got["mean_iu"] == ref["mean_iu"]


def test_meshed_evaluator_composes_with_eval_batch():
    """mesh + eval_batch > 1: the batch axis stays replicated while H is
    sharded over 'spatial', and GSPMD must still produce the exact histogram
    (3 images through batch-2 groups exercises the padded partial group)."""
    from mrfp_tpu.data.datasets import SyntheticDataset
    from mrfp_tpu.train.evaluator import SegEvaluator

    model = MRFP(trunk="resnet-18", variant="D32")
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.PRNGKey(0), x)
    params, stats = variables["params"], variables.get("batch_stats", {})
    val = SyntheticDataset(length=3, hw=(HW, HW), seed=13)
    quiet = lambda *a, **k: None

    ref = SegEvaluator(model, params, stats).run(val, log=quiet)
    mesh = create_mesh(MeshConfig(data_parallel=1, spatial_parallel=4),
                       jax.devices()[:4])
    got = SegEvaluator(model, params, stats, mesh=mesh,
                       eval_batch=2).run(val, log=quiet)
    assert np.array_equal(got["hist"], ref["hist"])
    assert got["mean_iu"] == ref["mean_iu"]


@pytest.mark.parametrize("dp,sp", [
    pytest.param(2, 2, marks=pytest.mark.slow)])  # 112 s heavy mesh
def test_zoo_step_loss_invariant_under_mesh(dp, sp):
    """The RobustNet-zoo objective (CE + DSN aux + ISW whitening loss) under
    dp x sp sharding == 1-device loss: the DDP+SyncBatchNorm setup every
    reference zoo config trains with (config.py:92-93), via GSPMD."""
    import dataclasses

    from mrfp_tpu.models import DeepV3Plus, build_cov_layers
    from mrfp_tpu.train.zoo_step import covstat_pass, make_zoo_jitted_step

    wt = (0, 0, 0, 2, 2, 0, 0)
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, use_wtloss=True))
    model = DeepV3Plus(trunk="resnet-18", variant="D32", wt_layer=wt,
                       use_dsn=True)
    rng = np.random.default_rng(0)
    batch = 2 * dp
    images = rng.standard_normal((batch, HW, HW, 3)).astype(np.float32)
    labels = rng.integers(0, 19, (batch, HW, HW)).astype(np.int32)

    state0 = create_train_state(model, cfg.train, (1, HW, HW, 3))
    cov_layers = build_cov_layers("resnet-18", wt, clusters=5)
    v1 = jnp.asarray(images[:2])
    v2 = jnp.asarray(images[2:4])
    masks, nrc = covstat_pass(model, state0.params, state0.batch_stats,
                              cov_layers, [(v1, v2)])

    def one_loss(mesh_cfg, n_dev):
        mesh = create_mesh(mesh_cfg, jax.devices()[:n_dev])
        state = create_train_state(model, cfg.train, (1, HW, HW, 3))
        state = jax.device_put(state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        imgs, lbls = shard_batch(mesh, (images, labels))
        step = make_zoo_jitted_step(model, cfg, mesh, wt_masks=masks,
                                    wt_nrc=nrc)
        _, m = step(state, imgs, lbls)
        return float(m["loss"])

    loss_sp = one_loss(MeshConfig(data_parallel=dp, spatial_parallel=sp),
                       dp * sp)
    loss_1 = one_loss(MeshConfig(), 1)
    assert np.isfinite(loss_sp)
    assert abs(loss_sp - loss_1) <= 1e-4 * max(1.0, abs(loss_1)), (
        loss_sp, loss_1)


def test_batch_sharding_spec_includes_spatial_axis():
    mesh = create_mesh(MeshConfig(data_parallel=2, spatial_parallel=4))
    s4 = batch_sharding(mesh, 4)
    assert s4.spec == jax.sharding.PartitionSpec("data", "spatial", None, None)
    s3 = batch_sharding(mesh, 3)
    assert s3.spec == jax.sharding.PartitionSpec("data", "spatial", None)
    # pure-DP meshes keep the old spec (spatial axis size 1 is ignored)
    dp_mesh = create_mesh(MeshConfig())
    assert batch_sharding(dp_mesh, 4).spec == jax.sharding.PartitionSpec(
        "data", None, None, None)
