"""Serving export (mrfp_tpu/serving.py + cli/export.py): the frozen
StableHLO artifact must reproduce the live model bit-for-bit after a full
serialize -> file -> deserialize round trip, and the CLI must drive it.
The reference has no export story (deployment = .pth + model source,
main.py:884-893); this is the TPU-native torchscript/ONNX equivalent."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from mrfp_tpu.models import MRFP
from mrfp_tpu.serving import load_exported, save_exported

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_roundtrip_bitexact(tmp_path):
    model = MRFP(trunk="resnet-18", variant="D32")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def forward(image):
        out = model.apply(variables, image, train=False, mutable=False)
        return out["logits"].astype(jnp.float32)

    from jax import export as jax_export
    spec = jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.float32)
    exported = jax_export.export(jax.jit(forward))(spec)

    path = str(tmp_path / "m.mrfpx")
    save_exported(path, exported, {"format": "mrfpx-v1"})
    fn, manifest = load_exported(path)
    assert manifest["format"] == "mrfpx-v1"

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(fn(x)),
                                  np.asarray(jax.jit(forward)(x)))


def test_export_uint8_wire_matches_float32(tmp_path):
    """A uint8-input export (cli.export --wire uint8, the default) must
    produce bit-identical logits to the float32-fed forward: the in-graph
    uint8 -> f32 cast is exact, only the ingress bytes shrink 4x."""
    model = MRFP(trunk="resnet-18", variant="D32")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)

    def forward(image):
        out = model.apply(variables, image.astype(jnp.float32),
                          train=False, mutable=False)
        return out["logits"].astype(jnp.float32)

    from jax import export as jax_export
    spec = jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.uint8)
    exported = jax_export.export(jax.jit(forward))(spec)
    path = str(tmp_path / "u8.mrfpx")
    save_exported(path, exported, {"format": "mrfpx-v1",
                                   "input": {"dtype": "uint8"}})
    fn, manifest = load_exported(path)
    assert manifest["input"]["dtype"] == "uint8"

    rng = np.random.default_rng(3)
    xu = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fn(xu)),
        np.asarray(jax.jit(forward)(xu.astype(np.float32))))


def test_export_cli_zoo_whitening_arch(tmp_path):
    """cli.export on a whitening-bearing DeepV3Plus zoo arch (--wt-layer
    selects the zoo family; ISW slots 2/3/4): the --check round trip must
    hold — whitening layers run their frozen eval-mode statistics inside
    the artifact, and the manifest records the zoo identity. Closes the
    round-4 gap 'zoo archs cannot be exported' (reference deploy path being
    replaced: main.py:884-893)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    out = str(tmp_path / "zoo.mrfpx")
    proc = subprocess.run(
        [sys.executable, "-m", "mrfp_tpu.cli.export", "--out", out,
         "--trunk", "resnet-18", "--variant", "D32",
         "--wt-layer", "0", "0", "2", "2", "2", "0", "0",
         "--batch", "1", "--height", "64", "--width", "64",
         "--dtype", "float32", "--check"],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    fn, manifest = load_exported(out)
    assert manifest["model"]["family"] == "deepv3_zoo"
    assert manifest["model"]["wt_layer"] == [0, 0, 2, 2, 2, 0, 0]
    # the artifact serves the MAIN logits only (19 classes at input res)
    assert manifest["output"]["shape"] == [1, 64, 64, 19]


def test_export_rejects_bad_magic(tmp_path):
    path = str(tmp_path / "junk.mrfpx")
    with open(path, "wb") as f:
        f.write(b"NOTMRFPX rest")
    try:
        load_exported(path)
    except ValueError as e:
        assert "magic" in str(e)
    else:
        raise AssertionError("bad magic accepted")


def test_export_cli_check(tmp_path):
    """cli.export with --check: random-init model, small shape, the CLI's
    own round-trip assertion is the test."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    out = str(tmp_path / "m.mrfpx")
    proc = subprocess.run(
        [sys.executable, "-m", "mrfp_tpu.cli.export", "--out", out,
         "--trunk", "resnet-18", "--variant", "D32", "--batch", "1",
         "--height", "64", "--width", "64", "--dtype", "float32", "--check"],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert os.path.exists(out)
