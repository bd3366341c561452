"""Zoo coverage: every trunk/variant builds and runs; whitening plumbing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrfp_tpu.models.deepv3_zoo import (
    DeepV3Plus,
    MODEL_REGISTRY,
    build_cov_layers,
    covstat_update,
    get_net,
    whitening_loss_from_cov,
)
from mrfp_tpu.nn.cov_settings import CovMatrixIRW, CovMatrixISW, kmeans_1d
from mrfp_tpu.nn.shufflenet import channel_shuffle


def _run(model, hw=32, train=False):
    x = jnp.zeros((1, hw, hw, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    mutable = ["batch_stats"] if train else False
    rngs = {"dropout": jax.random.PRNGKey(1)} if train else None
    out = model.apply(variables, x, train=train, mutable=mutable, rngs=rngs)
    return out[0] if train else out


LIGHT_TRUNKS = ["resnet-18", "mobilenetv2", "shufflenetv2"]


@pytest.mark.parametrize("trunk", LIGHT_TRUNKS)
def test_zoo_trunks_run(trunk):
    model = DeepV3Plus(trunk=trunk, variant="D16", use_dsn=True)
    out = _run(model, train=True)
    assert out["logits"].shape == (1, 32, 32, 19)
    assert out["dsn"].shape[:1] == (1,)


@pytest.mark.parametrize("variant", ["D", "D16", "D32"])
def test_variants_change_output_stride(variant):
    model = DeepV3Plus(trunk="resnet-18", variant=variant, use_dsn=False)
    out = _run(model, hw=64)
    assert out["logits"].shape == (1, 64, 64, 19)


@pytest.mark.parametrize("trunk", ["mobilenetv2", "shufflenetv2"])
@pytest.mark.parametrize("variant", ["D", "D16"])
def test_mobile_trunk_dilation_surgery(trunk, variant):
    """The stride->dilation conversion keeps final feature resolution at
    os8 (D) / os16 (D16) for the mobile trunks (network/deepv3.py:194-298)."""
    import jax as _jax
    from mrfp_tpu.nn.mobilenet import MobileNetV2
    from mrfp_tpu.nn.shufflenet import ShuffleNetV2
    bb = (MobileNetV2 if trunk == "mobilenetv2" else ShuffleNetV2)(
        variant=variant)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vs = bb.init({"params": _jax.random.PRNGKey(0)}, x, train=False)
    feats = bb.apply(vs, x, train=False, mutable=False)
    os_expected = 8 if variant == "D" else 16
    # layer4 (conv head) keeps the dilated resolution
    assert feats["layer4"].shape[1] == 64 // os_expected


def test_heavy_trunks_build():
    # init-only for the big ones (keep CI fast); params must materialize
    for trunk in ["resnet-101", "se_resnext-50"]:
        model = DeepV3Plus(trunk=trunk, variant="D16", use_dsn=False)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False))
        assert "params" in variables


def test_wider_resnet_runs():
    from mrfp_tpu.nn.wider_resnet import wider_resnet38_a2
    m = wider_resnet38_a2()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = m.apply(variables, x, train=False, mutable=False)
    assert feats["out"].shape[-1] == 4096
    assert feats["out"].shape[1] == 8  # os 8 with dilation=True


def test_instance_whitening_collects_maps():
    model = DeepV3Plus(trunk="resnet-18", variant="D16",
                       wt_layer=(0, 0, 0, 2, 2, 0, 0), use_dsn=False)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert len(out["w_arr"]) == 2  # layer1 + layer2 last blocks


def test_isw_covstat_and_loss_pipeline():
    wt = (0, 0, 0, 2, 2, 0, 0)
    model = DeepV3Plus(trunk="resnet-18", variant="D16", wt_layer=wt,
                       use_dsn=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    cov_layers = build_cov_layers("resnet-18", wt, clusters=5)
    assert len(cov_layers) == 2 and all(isinstance(c, CovMatrixISW)
                                        for c in cov_layers)
    # two covstat passes then mask selection
    for _ in range(2):
        out = model.apply(variables, x, train=False, mutable=False,
                          cal_covstat=True)
        covstat_update(cov_layers, out["w_arr"])
    for c in cov_layers:
        c.set_mask_matrix()
        assert 0 < c.num_sensitive < c.dim * c.dim
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    loss = whitening_loss_from_cov(out["w_arr"], cov_layers)
    assert np.isfinite(float(loss)) and float(loss) >= 0


def test_kmeans_1d_orders_clusters():
    v = np.array([0.0, 0.1, 0.05, 5.0, 5.1, 10.0])
    assign, cents = kmeans_1d(v, 3)
    assert assign[0] == assign[1] == assign[2] == 0
    assert assign[5] == 2
    assert np.all(np.diff(cents) > 0)


def test_irw_mask_is_off_diagonal():
    c = CovMatrixIRW(dim=8)
    eye, mask, margin, n = c.get_mask_matrix()
    assert n == 28 and margin == 0
    assert mask.sum() == 28 and np.trace(mask) == 0


def test_channel_shuffle_matches_torch_semantics():
    import torch
    x = np.arange(2 * 3 * 3 * 8, dtype=np.float32).reshape(2, 3, 3, 8)
    ours = np.asarray(channel_shuffle(jnp.asarray(x), 2))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    b, c, h, w = t.shape
    t = t.view(b, 2, c // 2, h, w).transpose(1, 2).contiguous().view(b, c, h, w)
    ref = np.transpose(t.numpy(), (0, 2, 3, 1))
    np.testing.assert_array_equal(ours, ref)


def test_registry_names_match_reference():
    expected = {"DeepR18V3PlusD", "DeepR50V3PlusD", "DeepR50V3PlusD_OS8",
                "DeepR101V3PlusD", "DeepR101V3PlusD_OS8",
                "DeepShuffleNetV3PlusD", "DeepShuffleNetV3PlusD_OS8",
                "DeepShuffleNetV3PlusD_OS32", "DeepMobileNetV3PlusD",
                "DeepMobileNetV3PlusD_OS8"}
    assert expected <= set(MODEL_REGISTRY)
    m = get_net("DeepR18V3PlusD", use_dsn=False)
    assert m.trunk == "resnet-18" and m.variant == "D"


def test_whitening_loss_uses_per_layer_margins():
    """With relax_denom > 0 each ISW layer carries its own margin; the loss
    must use layer i's margin for map i (network/deepv3.py:561-568), not the
    last layer's."""
    import jax.numpy as jnp
    import numpy as np
    from mrfp_tpu.train.losses import instance_whitening_loss

    rng = np.random.default_rng(0)
    w_arr = [jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32),
             jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)]
    masks = [jnp.triu(jnp.ones((8, 8), jnp.float32), k=1)] * 2
    nrcs = [28.0, 28.0]
    per_layer = float(instance_whitening_loss(w_arr, masks, [0.0, 100.0], nrcs))
    # margin 100 clamps map 1's penalty to zero -> equals map-0-only loss
    map0_only = float(instance_whitening_loss(w_arr[:1], masks[:1], 0.0,
                                              nrcs[:1]))
    assert abs(per_layer - map0_only) < 1e-6
    # the old bug applied the LAST margin to every map
    buggy = float(instance_whitening_loss(w_arr, masks, 100.0, nrcs))
    assert buggy < per_layer
