"""Matchstick-style in-block perturbation injection (Resnet.py:229-334,
664-723): every Bottleneck accepts inject=(site, value); stages route it by
block index. Parity vs the torch oracle with identical weights."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mrfp_tpu.models import MRFP
from mrfp_tpu.train.import_torch import convert_state_dict

import torch_oracle as TO


@pytest.mark.parametrize("inject_block,site", [(1, 1), (2, 2), (0, 1)])
def test_stage_injection_matches_oracle(inject_block, site):
    sd = TO.make_reference_state_dict(seed=13)
    model = MRFP(trunk="resnet-50", variant="D16")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    params, stats, _oc, _rep = convert_state_dict(sd, variables)

    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    bound = model.bind(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        mutable=["batch_stats"])
    xp = bound.backbone.stem(jnp.asarray(img), [], False)
    # perturbation tensor at the injection site's feature shape:
    # stage1 (layer1) keeps stem resolution; site channels: conv1-in = 256
    # after block0... block0 input is 64ch. site 1 of block b>=1 sees 256ch,
    # site 2 sees the conv1 output width (64).
    c = {(-1, 1): 64}.get((inject_block, site))
    if c is None:
        c = 64 if inject_block == 0 and site == 1 else (64 if site == 2 else 256)
    v = 0.3 * rng.standard_normal(
        (2, xp.shape[1], xp.shape[2], c)).astype(np.float32)

    ours = bound.backbone.stage(0, xp, [], False,
                                inject=(inject_block, site, jnp.asarray(v)))

    sds = TO._strip(sd)
    xt = TO._stem(sds, torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()))
    vt = torch.from_numpy(np.transpose(v, (0, 3, 1, 2)).copy())
    ref = TO._stage(sds, xt, 1, inject=(inject_block, site, vt))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_zero_injection_is_identity():
    model = MRFP(trunk="resnet-50", variant="D16")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 32, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    bound = model.bind(variables, mutable=["batch_stats"])
    xp = bound.backbone.stem(x, [], False)
    a = bound.backbone.stage(0, xp, [], False)
    z = jnp.zeros((1, xp.shape[1], xp.shape[2], 256))
    b = bound.backbone.stage(0, xp, [], False, inject=(1, 1, z))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
