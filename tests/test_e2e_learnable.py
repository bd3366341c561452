"""End-to-end quality proof on a learnable synthetic task through the REAL
CLIs: cli.train (MRFP+ gates ON) -> Orbax checkpoint -> cli.eval, asserting
the loop learns *structure* (color->class mIoU far above chance), not just
optimizer dynamics. This is the largest executable slice of the reference's
real-data claim (train loop main.py:844-871, eval loop main.py:876-913) in
a sandbox without GTAV/Cityscapes.

Budgets (calibrated on this task, 2026-08-17; chance mIoU ~0.03):
- default slow test: 400 CPU steps -> measured mIoU 0.69 (MRFP+) / 0.62
  (baseline); asserts >= 0.5 — structure beyond any doubt in ~12 min.
- MRFP_E2E_FULL=1: 5000 steps -> mIoU >= 0.9 both modes (measured 0.934
  MRFP+ / 0.869 baseline@2000; see CLAUDE.md round-3 notes). Hours on CPU,
  minutes on TPU — run manually, like the 16.7M color-oracle test.
Convergence on this task is genuinely slow (receptive-field mixing across
block boundaries), matching the reference's 40k-iter recipe in spirit.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

from synthetic_task import build_gtav_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULL = os.environ.get("MRFP_E2E_FULL", "") == "1"


def _cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    return env


def _run(args, timeout=3600):
    proc = subprocess.run([sys.executable, "-m"] + args, env=_cli_env(),
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc.stdout + proc.stderr


def _train_and_eval(tree, runs_dir, mode, steps):
    out = _run([
        "mrfp_tpu.cli.train", "--source", "gtav", "--data-root", tree,
        "--trunk", "resnet-18", "--variant", "D32", "--mode", mode,
        "--batch-size", "8", "--crop-size", "64", "--max-iter", str(steps),
        "--lr", "1e-2" if FULL else "2e-2",
        "--no-color-jitter", "--no-gaussian-blur",
        "--scale-range", "1.0", "1.0", "--ckpt-every", str(steps),
        "--log-every", "100", "--runs-dir", runs_dir])
    ckpts = glob.glob(os.path.join(runs_dir, "*", "ckpt"))
    assert len(ckpts) == 1, (ckpts, out[-2000:])

    j = os.path.join(runs_dir, "metrics.json")
    _run(["mrfp_tpu.cli.eval", "--ckpt", ckpts[0], "--trunk", "resnet-18",
          "--variant", "D32", "--domains", "gtav", "--data-root", tree,
          "--json-out", j])
    return json.load(open(j))["gtav"], out


@pytest.mark.slow
def test_cli_loop_learns_structure(tmp_path):
    tree = build_gtav_tree(str(tmp_path / "gtav"))
    steps = 5000 if FULL else 400
    floor = 0.90 if FULL else 0.50

    # MRFP+ (all three perturbation gates live) must learn the task
    res, log = _train_and_eval(tree, str(tmp_path / "runs_mrfp"), "mrfp+",
                               steps)
    assert res["mean_iu"] >= floor, (res, log[-2000:])

    # the unperturbed baseline learns it too (perturbation is a
    # generalization device, not a prerequisite; both converging is the
    # sanity the reference's Table 1 baseline row implies)
    res_b, log_b = _train_and_eval(tree, str(tmp_path / "runs_base"),
                                   "baseline", steps)
    assert res_b["mean_iu"] >= floor, (res_b, log_b[-2000:])
