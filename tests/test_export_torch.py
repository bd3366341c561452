"""Reverse checkpoint export (Orbax/our tree -> reference .pth).

Three gates on train.export_torch (the inverse of train.import_torch):

1. Round trip is bit-exact: a reference-format state_dict imported and
   re-exported reproduces every tensor (modulo the documented inert buffers:
   num_batches_tracked and the train-mode-only OC BN running stats).
2. Key-set parity: the exported dict has EXACTLY the reference MRFPPlus key
   set, i.e. the upstream ``load_state_dict(..., strict=True)``
   (main.py:884-886) would accept it.
3. Semantics on native weights: a natively-initialized model (weights the
   reference has never seen) exported to .pth and run through the torch
   oracle of the reference eval forward (deepv3.py:280-367) matches our
   jitted eval logits — the "train on TPU, serve with the existing torch
   stack" migration path.

Plus a CLI-level gate: cli.train -> cli.convert --run -> cli.eval on the
exported .pth reproduces the Orbax eval metrics exactly.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from mrfp_tpu.models import MRFP
from mrfp_tpu.perturb import oc_init
from mrfp_tpu.train.export_torch import export_state_dict, save_torch_checkpoint
from mrfp_tpu.train.import_torch import convert_state_dict, load_torch_checkpoint

from torch_oracle import make_reference_state_dict, reference_eval_forward

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# inert buffers: never read by the reference on any path we replace
_INERT = ("num_batches_tracked",)
_OC_BN = tuple(f"module.OC{k}_{s}bn" for k in range(1, 5) for s in ("", "dec"))


def _is_inert(key: str) -> bool:
    if key.endswith(_INERT):
        return True
    return key.startswith(_OC_BN) and key.endswith(("running_mean",
                                                    "running_var"))


@pytest.fixture(scope="module")
def imported():
    sd = make_reference_state_dict(seed=3)
    model = MRFP(trunk="resnet-50", variant="D16")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats, oc, report = convert_state_dict(sd, variables)
    assert report["skipped"] == []
    return sd, params, stats, oc


def test_roundtrip_key_set_is_strict(imported):
    sd, params, stats, oc = imported
    out = export_state_dict(params, stats, oc)
    assert set(out) == set(sd)


def test_roundtrip_bit_exact(imported):
    sd, params, stats, oc = imported
    out = export_state_dict(params, stats, oc)
    checked = 0
    for k, v in sd.items():
        if _is_inert(k):
            continue
        np.testing.assert_array_equal(out[k], v.numpy(), err_msg=k)
        checked += 1
    # the whole live MRFPPlus tensor set: 431 keys minus 69
    # num_batches_tracked and 16 OC-BN running stats
    assert checked == 346


def test_native_weights_match_oracle_eval_forward(tmp_path):
    """Weights the reference never produced, exported and run through the
    reference-semantics torch oracle."""
    model = MRFP(trunk="resnet-50", variant="D16")
    variables = model.init({"params": jax.random.PRNGKey(7)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params = variables["params"]
    # make batch_stats non-trivial (fresh init is mean=0/var=1 everywhere,
    # which would hide running_mean/var mapping bugs): one train step's EMA
    rng = np.random.default_rng(11)
    x_warm = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    _, mutated = model.apply(variables, x_warm, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    stats = mutated["batch_stats"]

    path = str(tmp_path / "native.pth")
    n = save_torch_checkpoint(path, params, stats,
                              oc_init(jax.random.PRNGKey(5)), epoch=123)
    blob = torch.load(path, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 123
    assert n == len(blob["state_dict"]) == 431  # upstream MRFPPlus tensor set

    x = rng.standard_normal((1, 66, 98, 3)).astype(np.float32)
    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False, mutable=False)
    ours = np.asarray(ours["logits"])
    ref = reference_eval_forward(blob["state_dict"], torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2)).copy()))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    # and the exported file re-imports losslessly (both directions stable)
    params2, stats2, oc2, report = load_torch_checkpoint(path, variables)
    assert report["skipped"] == []
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, params2)
    jax.tree_util.tree_map(np.testing.assert_array_equal, stats, stats2)


@pytest.mark.slow
def test_zoo_export_strict_keys_and_bit_exact():
    """RobustNet-zoo checkpoints (DeepR50V3PlusD, ISW wt_layer) round-trip
    through import -> export with the upstream model's exact key set."""
    from ref_fixture import make_zoo_state_dict, reference_available
    if not reference_available():
        pytest.skip("upstream reference checkout not present")
    from mrfp_tpu.models.deepv3_zoo import DeepV3Plus

    # wt all-zero: the vendored upstream hard-overrides wt_layer to [0]*7
    # (network/deepv3.py:119, see ref_fixture.make_zoo_state_dict), so its
    # real checkpoints never contain whitening layers
    sd = make_zoo_state_dict("DeepR50V3PlusD", wt_layer=(0,) * 7)
    model = DeepV3Plus(trunk="resnet-50", variant="D16",
                       wt_layer=(0,) * 7, use_dsn=True)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats, oc, report = convert_state_dict(sd, variables)
    assert report["skipped"] == [], report["skipped"][:10]
    assert oc is None

    out = export_state_dict(params, stats, None, module_prefix=False)
    assert set(out) == set(sd)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(out[k], v.numpy(), err_msg=k)


def _cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    return env


def _run(args):
    proc = subprocess.run([sys.executable, "-m"] + args, env=_cli_env(),
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return proc.stdout


@pytest.mark.slow
def test_cli_export_then_eval_matches_orbax_eval(tmp_path):
    """Native train -> reverse convert -> eval the .pth: identical metrics
    to evaluating the Orbax run directly."""
    runs = str(tmp_path / "runs")
    _run(["mrfp_tpu.cli.train", "--synthetic", "--trunk", "resnet-50",
          "--variant", "D16", "--mode", "mrfp+", "--batch-size", "2",
          "--crop-size", "32", "--max-iter", "3", "--ckpt-every", "3",
          "--log-every", "3", "--lr", "1e-3", "--runs-dir", runs])
    (run_dir,) = [os.path.join(runs, d) for d in os.listdir(runs)
                  if os.path.isdir(os.path.join(runs, d))]
    ckpt = os.path.join(run_dir, "ckpt")

    pth = str(tmp_path / "exported.pth")
    _run(["mrfp_tpu.cli.convert", "--run", ckpt, "--out", pth,
          "--trunk", "resnet-50", "--variant", "D16"])

    j1, j2 = str(tmp_path / "m_orb.json"), str(tmp_path / "m_pth.json")
    eval_args = ["mrfp_tpu.cli.eval", "--synthetic", "--synthetic-hw", "64",
                 "96", "--domains", "cityscapes", "--max-images", "2",
                 "--trunk", "resnet-50", "--variant", "D16"]
    _run(eval_args + ["--ckpt", ckpt, "--json-out", j1])
    _run(eval_args + ["--ckpt", pth, "--json-out", j2])
    m_orb, m_pth = json.load(open(j1)), json.load(open(j2))
    assert m_orb["cityscapes"] == m_pth["cityscapes"], (m_orb, m_pth)
