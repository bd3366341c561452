"""BASELINE config 1: checkpoint-parity inference.

A synthetic checkpoint in the reference's exact state_dict format is loaded
through the importer; our jitted eval forward must match the torch oracle of
the reference eval semantics (deepv3.py:280-367, training=False) pixelwise.
This is the gate that validates conv padding/stride/dilation, D16 surgery,
InstanceNorm placement (wt_layer=[0,0,4,4,4,0,0]), eval-BN, ASPP concat
order, bilinear align_corners resizes, and the importer's OIHW->HWIO mapping
all at once.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mrfp_tpu.models import MRFP
from mrfp_tpu.train.import_torch import convert_state_dict

from torch_oracle import (
    make_reference_state_dict,
    reference_eval_forward,
    reference_train_forward,
)


@pytest.fixture(scope="module")
def setup():
    sd = make_reference_state_dict(seed=0)
    model = MRFP(trunk="resnet-50", variant="D16")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats, oc, report = convert_state_dict(sd, variables)
    return sd, model, params, stats, oc, report


def test_importer_loads_everything(setup):
    sd, model, params, stats, oc, report = setup
    # every reference tensor except num_batches_tracked must land somewhere
    n_tensors = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert report["skipped"] == [], f"skipped: {report['skipped'][:10]}"
    assert report["loaded"] == n_tensors
    assert oc is not None and set(oc) == {f"enc{i}" for i in range(1, 5)} | \
        {f"dec{i}" for i in range(1, 5)}
    for v in oc.values():
        assert set(v) == {"kernel", "bias", "bn_scale", "bn_bias"}


@pytest.mark.parametrize("hw", [(64, 64), (66, 98)])
def test_eval_logits_match_reference(setup, hw):
    sd, model, params, stats, oc, _ = setup
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, *hw, 3)).astype(np.float32)

    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False, mutable=False)
    ours = np.asarray(ours["logits"])

    ref = reference_eval_forward(sd, torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2)).copy()))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
    # argmax agreement (the metric that matters for mIoU parity)
    agree = (ours.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.999


def test_train_mode_bn_logits_match_reference(setup):
    """Train forward with all gates off: BNs use batch statistics (loss-curve
    parity depends on this path)."""
    sd, model, params, stats, oc, _ = setup
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    out, _mut = model.apply({"params": params, "batch_stats": stats},
                            jnp.asarray(x), train=True, perturb=None,
                            mutable=["batch_stats"])
    ours = np.asarray(out["logits"])
    ref = reference_train_forward(sd, torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2)).copy()))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    # batch-stat normalization amplifies fp reduction-order noise; bound the
    # absolute error and require argmax agreement
    np.testing.assert_allclose(ours, ref, atol=6e-3)
    # random-weight logit margins are tiny; small fp noise flips some argmaxes
    assert (ours.argmax(-1) == ref.argmax(-1)).mean() > 0.995
