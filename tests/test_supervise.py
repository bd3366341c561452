"""Supervisor CLI (cli/supervise.py): relaunch on restartable exits only.

Covers the policy matrix with an injected runner (no real TPU probes: the
health wait no-ops on the forced-CPU test platform) plus one real
subprocess round trip through __main__."""

import os
import subprocess
import sys

import pytest

from mrfp_tpu.cli.supervise import parse_args, supervise


class FakeRun:
    def __init__(self, codes):
        self.codes = list(codes)
        self.calls = 0

    def __call__(self, cmd):
        self.calls += 1
        rc = self.codes.pop(0)
        return subprocess.CompletedProcess(cmd, rc)


def test_success_first_try():
    r = FakeRun([0])
    assert supervise(["x"], backoff=0, health_wait=0, _run=r) == 0
    assert r.calls == 1


def test_restarts_on_75_until_success():
    r = FakeRun([75, 75, 0])
    assert supervise(["x"], backoff=0, health_wait=0, _run=r) == 0
    assert r.calls == 3


def test_sigkill_is_restartable():
    r = FakeRun([-9, 0])
    assert supervise(["x"], backoff=0, health_wait=0, _run=r) == 0
    assert r.calls == 2


def test_real_error_propagates_immediately():
    r = FakeRun([1])
    assert supervise(["x"], backoff=0, health_wait=0, _run=r) == 1
    assert r.calls == 1


def test_restart_budget_exhausts():
    r = FakeRun([75] * 4)
    assert supervise(["x"], max_restarts=3, backoff=0, health_wait=0, _run=r) == 75
    assert r.calls == 4


def test_parse_args_strips_separator():
    a = parse_args(["--max-restarts", "5", "--", "python", "-c", "pass"])
    assert a.command == ["python", "-c", "pass"]
    assert a.max_restarts == 5


def test_parse_args_requires_command():
    with pytest.raises(SystemExit):
        parse_args(["--max-restarts", "5"])


def test_subprocess_round_trip(tmp_path):
    """Real invocation: child exits 75 once (leaving a marker), then 0."""
    marker = tmp_path / "tried"
    child = (f"import os,sys; p={str(marker)!r}\n"
             "sys.exit(0) if os.path.exists(p) else "
             "(open(p,'w').close(), sys.exit(75))")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    env["JAX_PLATFORMS"] = "cpu"  # health wait must no-op
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo + (os.pathsep + pp if pp else "")
    proc = subprocess.run(
        [sys.executable, "-m", "mrfp_tpu.cli.supervise", "--backoff", "0",
         "--", sys.executable, "-c", child],
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "relaunch 1/" in (proc.stdout + proc.stderr)


def test_unlaunchable_command_is_clean_error():
    assert supervise(["definitely-not-a-command-xyz"], backoff=0,
                     health_wait=0) == 127
