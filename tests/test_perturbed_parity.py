"""Composed gates-ON train-forward parity vs the torch oracle.

Drives OUR full MRFP+ perturbed train forward (OC stem injection + NP+ at
both sites + decoder injection, deepv3.py:280-367) and the torch oracle with
IDENTICAL randomness: the OC weights come from one reference state_dict via
the checkpoint importer, and the NP+ normal draws are computed once from the
jax keys and injected into the oracle. Round-1 gap: OC/NP+ were only
unit-tested separately (VERDICT item 5).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mrfp_tpu.models import MRFP
from mrfp_tpu.models.mrfp import PerturbArgs
from mrfp_tpu.train.import_torch import convert_state_dict

from torch_oracle import (make_reference_state_dict,
                          reference_train_forward_perturbed)

B, HW, STD = 2, 48, 0.75


def _np_draws(key, c):
    """Reproduce normalization_perturbation_plus's two draws externally."""
    k1, k2 = jax.random.split(key)
    alpha = 1.0 + STD * jax.random.normal(k1, (B, 1, 1, c), jnp.float32)
    beta = STD * jax.random.normal(k2, (B, 1, 1, c), jnp.float32)
    return alpha, beta


def _to_torch(a):  # (B,1,1,C) -> (B,C,1,1)
    return torch.from_numpy(np.transpose(np.asarray(a), (0, 3, 1, 2)).copy())


@pytest.mark.parametrize("gates", [(True, True, True), (True, False, False),
                                   (False, True, False), (False, False, True)])
def test_gates_on_train_forward_parity(gates):
    gate_oc, gate_np, gate_dec = gates
    sd = make_reference_state_dict(seed=11)
    model = MRFP(trunk="resnet-50", variant="D16")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, HW, HW, 3)), train=False)
    params, stats, oc_params, report = convert_state_dict(sd, variables)
    assert not report["skipped"]

    rng = np.random.default_rng(5)
    img = rng.standard_normal((B, HW, HW, 3)).astype(np.float32)

    key0, key1 = jax.random.PRNGKey(21), jax.random.PRNGKey(22)
    a0, b0 = _np_draws(key0, 64)
    a1, b1 = _np_draws(key1, 256)

    perturb = PerturbArgs(
        gate_oc=jnp.asarray(gate_oc), gate_np=jnp.asarray(gate_np),
        gate_dec=jnp.asarray(gate_dec), key_np0=key0, key_np1=key1,
        oc_params=jax.tree_util.tree_map(jnp.asarray, oc_params))
    out, _ = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(img), train=True, perturb=perturb,
        mutable=["batch_stats"])
    ours = np.asarray(out["logits"])

    noise = {"alpha0": _to_torch(a0), "beta0": _to_torch(b0),
             "alpha1": _to_torch(a1), "beta1": _to_torch(b1)}
    ref = reference_train_forward_perturbed(
        sd, torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
        noise, gate_oc, gate_np, gate_dec)
    ref = np.transpose(ref.detach().numpy(), (0, 2, 3, 1))

    # fp32 noise amplifies ~100x through 16 train-mode BN blocks (measured:
    # per-site parity is <=3e-5, final logits differ <=0.014 on std~1
    # logits). A semantic bug (wrong gate site, missing injection, wrong
    # randomness) shows as O(1) logit error and O(0.1) loss error.
    assert np.abs(ours - ref).max() < 0.05, np.abs(ours - ref).max()

    lbl = np.random.default_rng(9).integers(0, 19, (B, HW, HW))
    from mrfp_tpu.train.losses import cross_entropy
    loss_ours = float(cross_entropy(jnp.asarray(ours),
                                    jnp.asarray(lbl, jnp.int32), 255))
    loss_ref = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(np.transpose(ref, (0, 3, 1, 2)).copy()),
        torch.from_numpy(lbl.astype(np.int64)), ignore_index=255))
    assert abs(loss_ours - loss_ref) < 5e-4, (loss_ours, loss_ref)
