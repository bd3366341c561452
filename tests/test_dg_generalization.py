"""Domain-generalization proof through the REAL CLIs: the reference's
scientific claim (feature perturbation improves zero-shot transfer to an
unseen visual domain, README.md:5-27 / the MRFP paper's GTAV->Cityscapes
table) compressed into a sandbox-executable experiment.

Protocol (tests/synthetic_task.py build_dg_tree): class = TEXTURE (a
style-invariant cue), per-image colors drawn from a DOMAIN-specific
photometric style. Train on the warm/bright "source" style with NO color
jitter (isolating the model-level mechanism), evaluate zero-shot on the
cool/dim "target" style. A model that latches onto absolute channel
statistics transfers badly; MRFP+'s feature-statistic perturbation is
exactly the device meant to prevent that (deepv3.py:280-367).

Assertions (calibrated, see CLAUDE.md round-3 notes):
- both arms learn the SOURCE domain (capacity sanity),
- MRFP+ holds up on TARGET far above the baseline (the headline claim).

The default slow test runs a small CPU version; MRFP_DG_FULL=1 runs the
full-budget version (minutes on TPU through the same code path).
"""

import glob
import json
import os
import subprocess
import sys

import pytest

from synthetic_task import build_dg_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULL = os.environ.get("MRFP_DG_FULL", "") == "1"


def _cli_env(platform="cpu"):
    env = dict(os.environ)
    if platform is not None:
        env["JAX_PLATFORMS"] = platform
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    return env


def _run(args, timeout=7200, platform="cpu"):
    proc = subprocess.run([sys.executable, "-m"] + args,
                          env=_cli_env(platform), capture_output=True,
                          text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc.stdout + proc.stderr


def train_arm(src_tree, runs_dir, mode, steps, crop, lr="1e-2",
              platform="cpu"):
    """Train one arm on the source tree; returns its checkpoint dir."""
    _run(["mrfp_tpu.cli.train", "--source", "gtav", "--data-root", src_tree,
          "--trunk", "resnet-18", "--variant", "D32", "--mode", mode,
          "--batch-size", "8", "--crop-size", str(crop),
          "--max-iter", str(steps), "--lr", lr,
          "--no-color-jitter", "--no-gaussian-blur",
          "--scale-range", "1.0", "1.0", "--ckpt-every", str(steps),
          "--log-every", "100", "--runs-dir", runs_dir],
         platform=platform)
    ckpts = glob.glob(os.path.join(runs_dir, "*", "ckpt"))
    assert len(ckpts) == 1, ckpts
    return ckpts[0]


def eval_arm(ckpt, tree, json_path, platform="cpu"):
    """Zero-shot eval of a checkpoint on a DG tree's test split."""
    _run(["mrfp_tpu.cli.eval", "--ckpt", ckpt, "--trunk", "resnet-18",
          "--variant", "D32", "--domains", "gtav", "--data-root", tree,
          "--json-out", json_path], platform=platform)
    return json.load(open(json_path))["gtav"]


def run_dg_experiment(workdir, steps, crop=96, block=32, hw=256,
                      n_train=64, n_val=8, platform="cpu",
                      modes=("mrfp+", "baseline")):
    src = build_dg_tree(os.path.join(workdir, "src"), "source",
                        n_train=n_train, n_val=n_val, hw=hw, block=block)
    tgt = build_dg_tree(os.path.join(workdir, "tgt"), "target",
                        n_train=1, n_val=n_val, hw=hw, block=block)
    out = {}
    for mode in modes:
        ckpt = train_arm(src, os.path.join(workdir, f"runs_{mode}"),
                         mode, steps, crop, platform=platform)
        out[mode] = {
            "source": eval_arm(ckpt, src,
                               os.path.join(workdir, f"{mode}_src.json"),
                               platform=platform),
            "target": eval_arm(ckpt, tgt,
                               os.path.join(workdir, f"{mode}_tgt.json"),
                               platform=platform),
        }
    return out


@pytest.mark.slow
def test_mrfp_generalizes_across_style_shift(tmp_path):
    steps = 2000 if FULL else 300
    res = run_dg_experiment(str(tmp_path), steps)
    m, b = res["mrfp+"], res["baseline"]
    # capacity sanity: both arms learn the source domain
    assert m["source"]["mean_iu"] >= (0.80 if FULL else 0.35), res
    assert b["source"]["mean_iu"] >= (0.80 if FULL else 0.35), res
    # the headline claim: perturbation buys zero-shot robustness
    assert m["target"]["mean_iu"] >= (0.55 if FULL else 0.20), res
    assert m["target"]["mean_iu"] >= b["target"]["mean_iu"] + 0.08, res


if __name__ == "__main__":
    # full-budget manual run (TPU: inherits JAX_PLATFORMS from the env)
    import tempfile
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="dg_experiment_")
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    res = run_dg_experiment(workdir, steps, crop=256, block=64, hw=256,
                            n_train=200, n_val=16, platform=None)
    print(json.dumps(res, indent=2))
