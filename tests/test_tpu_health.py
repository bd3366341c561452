"""Axon preflight helper (utils/tpu_health.py): platform gating, advisory
lock liveness, and the subprocess probe. The probe exists because the axon
execute path can wedge in a way no in-process timeout can recover from
(CLAUDE.md); these tests run it against the CPU backend."""

import os
import subprocess
import sys

from mrfp_tpu.utils import tpu_health


def test_tpu_platform_parsing(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not tpu_health.tpu_platform()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert tpu_health.tpu_platform()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu,tpu")
    assert tpu_health.tpu_platform()
    monkeypatch.delenv("JAX_PLATFORMS")
    assert tpu_health.tpu_platform()  # unset: probe rather than skip
    # the axon plugin registers (and overrides JAX_PLATFORMS) whenever the
    # pool var is set — that alone must count as TPU
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    assert tpu_health.tpu_platform()


def test_wait_is_noop_on_cpu(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert tpu_health.wait_until_healthy(max_wait_s=0.0) is True


def test_wait_env_escape(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("MRFP_TPU_PREFLIGHT", "0")
    assert tpu_health.wait_until_healthy(max_wait_s=0.0) is True


def test_probe_once_cpu(monkeypatch):
    # force a genuinely-CPU probe: with the pool var present the axon
    # plugin would override JAX_PLATFORMS and reach for the tunnel
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert tpu_health.probe_once(timeout_s=240.0)


def test_probe_once_times_out(monkeypatch):
    # a probe that cannot finish must report unhealthy, not hang
    monkeypatch.setattr(tpu_health, "_PROBE_SRC",
                        "import time; time.sleep(60)")
    assert not tpu_health.probe_once(timeout_s=1.0)


def test_lock_liveness(tmp_path, monkeypatch):
    lock = tmp_path / "dev.lock"
    monkeypatch.setattr(tpu_health, "LOCK_FILE", str(lock))
    # no file -> not held
    assert not tpu_health._lock_holder_alive()
    # held by this (live) process
    lock.write_text(str(os.getpid()))
    assert tpu_health._lock_holder_alive()
    # held by a dead process -> ignored (wedged runs get SIGKILLed)
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()
    lock.write_text(str(proc.pid))
    assert not tpu_health._lock_holder_alive()
    # garbage contents -> ignored
    lock.write_text("not-a-pid")
    assert not tpu_health._lock_holder_alive()


def test_acquire_release_cycle(tmp_path, monkeypatch):
    lock = tmp_path / "dev.lock"
    monkeypatch.setattr(tpu_health, "LOCK_FILE", str(lock))
    tpu_health.acquire_device_lock()
    assert lock.read_text() == str(os.getpid())
    # a live holder makes wait_until_healthy block on the lock; at budget
    # end it must REFUSE to proceed (a second client can kill the holder's
    # job) — restartable exit 75, not proceed-anyway
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    import pytest
    with pytest.raises(SystemExit) as e:
        tpu_health.wait_until_healthy(max_wait_s=-1.0)
    assert e.value.code == 75
