"""Smoke + contract test for the preflight launch planner (cli.plan).

The planner compiles the exact sharded train step a launch would run and
reports collectives / per-chip memory / roofline inputs (the GSPMD
equivalent of knowing the reference's NCCL bill before paying it,
main.py:42-52, sync_switchwhiten.py:22-45). Deep collective-profile truth
is pinned in test_collective_audit.py; this test covers the CLI surface:
it must run from a clean environment (forced-CPU slice), emit valid JSON,
and its headline numbers must be self-consistent.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_plan_cli_dp_slice(tmp_path):
    out_json = str(tmp_path / "plan.json")
    env = dict(os.environ)
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    proc = subprocess.run(
        [sys.executable, "-m", "mrfp_tpu.cli.plan", "--trunk", "resnet-18",
         "--variant", "D32", "--batch-size", "4", "--crop-size", "64",
         "--data-parallel", "2", "--json-out", out_json],
        env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    rep = json.load(open(out_json))
    assert rep["mesh"] == {"data": 2, "model": 1, "spatial": 1}
    assert rep["devices"] == 2 and rep["platform"] == "cpu"

    # DP contract: params replicated per chip; grads fully synced — the
    # all-reduce payload is the fp32 grad set plus small BN-stat tuples
    ar = rep["collectives_per_step"]["all-reduce"]
    grad_mb = rep["fp32_grad_set_bytes"] / 1e6
    assert grad_mb <= ar["mbytes"] <= 1.1 * grad_mb + 16
    for bad in ("all-gather", "all-to-all", "collective-permute"):
        assert bad not in rep["collectives_per_step"], rep
    assert rep["per_chip_bytes"]["params"] == rep["fp32_grad_set_bytes"]
    # roofline inputs present and sane for a conv net
    assert rep["flops_per_step"] > 1e9
    assert rep["hbm_bytes_per_step"] > 1e8
    # the human-readable report precedes the JSON line
    assert "grad-sync check" in proc.stdout
