"""Preflight health check for the axon TPU tunnel.

The axon execute path can wedge independently of compile/devices (see
CLAUDE.md): ``jax.devices()`` answers and the remote compile helper works,
but every device execution hangs forever. Because the hang is inside a
blocking C call, an in-process timeout cannot recover from it — the only
safe probe is a **subprocess** that runs one tiny matmul under a wall-clock
timeout. This module gives long-lived entrypoints (bench.py, CLIs) a
bounded wait-until-healthy preflight so a transient wedge delays a run
instead of hanging it forever.

Also enforces the one-client-at-a-time rule: a second axon client can wedge
or kill the first (CLAUDE.md), so batch drivers take the advisory lock file
while they own the device and preflights wait for it to clear.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

LOCK_FILE = os.path.join(tempfile.gettempdir(),
                         f"mrfp_tpu_device-{os.getuid()}.lock")

_PROBE_SRC = ("import jax, jax.numpy as jnp; "
              "x = jnp.ones((256, 256), jnp.float32); "
              "print('probe-ok', float((x @ x).sum()))")


def _log(msg: str) -> None:
    print(f"[tpu_health] {msg}", file=sys.stderr, flush=True)


def acquire_device_lock() -> None:
    """Advisory single-client lock for a device-owning run: writes this
    PID to the lock file and removes it at interpreter exit. Best-effort —
    a stale file from a SIGKILLed holder is neutralized by the liveness
    check in :func:`wait_until_healthy` (dead PID => lock ignored)."""
    import atexit

    with open(LOCK_FILE, "w") as f:
        f.write(str(os.getpid()))

    def _cleanup():
        try:
            if int(open(LOCK_FILE).read().strip() or "0") == os.getpid():
                os.unlink(LOCK_FILE)
        except (OSError, ValueError):
            pass

    atexit.register(_cleanup)


def _lock_holder_alive() -> bool:
    try:
        pid = int(open(LOCK_FILE).read().strip() or "0")
    except (OSError, ValueError):
        return False
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except OSError:
        return False
    return True


def tpu_platform() -> bool:
    """True when this process will talk to a TPU-ish backend (axon/tpu).
    Decided from env alone so callers can gate the preflight without
    importing jax (tests force cpu and must not pay probe costs).

    NOTE: when PALLAS_AXON_POOL_IPS is set, the axon plugin registers at
    import and OVERRIDES JAX_PLATFORMS (see parallel/dryrun.py:36-39), so
    that var alone means TPU — tests pop it to stay genuinely on CPU."""
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    plats = os.environ.get("JAX_PLATFORMS", "")
    if not plats:
        return True  # unset: could be anything; probing is harmless
    return any(p.strip().lower() in ("axon", "tpu")
               for p in plats.split(","))


def probe_once(timeout_s: float = 240.0) -> bool:
    """Run one tiny device execution in a subprocess; True iff it completes
    within ``timeout_s``. Inherits the platform env (axon on the real box,
    cpu in tests); on a non-TPU platform the axon plugin registration is
    suppressed so the probe cannot reach for the tunnel behind our back."""
    env = dict(os.environ)
    if not tpu_platform():
        env.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        proc = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                              capture_output=True, text=True,
                              timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "probe-ok" in proc.stdout


def wait_until_healthy(max_wait_s: float = 1800.0,
                       probe_timeout_s: float = 240.0,
                       retry_sleep_s: float = 120.0) -> bool:
    """Bounded wait for (a) the advisory device lock to clear and (b) a
    probe execution to succeed. Returns True when healthy, False when the
    PROBE budget ran out (caller proceeds anyway — a hang then is no worse
    than not having probed). If the budget expires while another LIVE
    process still holds the device lock, raises ``SystemExit(75)`` instead:
    attaching a second axon client can wedge or kill the running job
    (CLAUDE.md), which is strictly worse than this process failing
    restartably. No-op on non-TPU platforms (forced-cpu tests).
    Set MRFP_TPU_PREFLIGHT=0 to skip entirely."""
    if os.environ.get("MRFP_TPU_PREFLIGHT", "1") == "0" or not tpu_platform():
        return True
    deadline = time.monotonic() + max_wait_s
    while os.path.exists(LOCK_FILE) and _lock_holder_alive():
        if time.monotonic() > deadline:
            _log("device lock still held by a live process at budget end; "
                 "refusing to attach a second client (exit 75)")
            raise SystemExit(75)
        _log(f"device lock held by a live process ({LOCK_FILE}); waiting")
        time.sleep(min(retry_sleep_s, 30.0))
    while True:
        t0 = time.monotonic()
        if probe_once(probe_timeout_s):
            _log(f"probe ok in {time.monotonic() - t0:.1f}s")
            return True
        if time.monotonic() > deadline:
            _log("probe never succeeded within budget; proceeding anyway")
            return False
        _log("probe failed/timed out (axon execute wedge?); retrying")
        time.sleep(retry_sleep_s)
