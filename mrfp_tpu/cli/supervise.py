"""Supervisor: relaunch a training command when it exits restartably.

The missing half of the failure-detection story: the step watchdog
(utils/watchdog.py) turns a wedged device execution into exit 75
(EX_TEMPFAIL), preemption-safe checkpointing (train/loop.py) makes every
restart a resume — this wrapper closes the loop by relaunching the command
until it succeeds, fails for real, or exhausts its restart budget:

    python -m mrfp_tpu.cli.supervise --max-restarts 20 -- \
        python -m mrfp_tpu.cli.train --source gtav ... --step-timeout 900

Policy:
- exit 0: done, exit 0.
- exit 75 (the watchdog's EX_TEMPFAIL) or death by SIGKILL (an OOM-killed
  or operator-killed job is worth one retry): wait for the device to probe
  healthy again (utils/tpu_health.wait_until_healthy — the wedge that
  caused the exit usually outlives the process), then relaunch.
- any other exit: a real error (bad config, NaN guard, assertion) —
  propagate it immediately; restarting would just repeat it.

The reference has nothing comparable — its README tells users to relaunch
`train.sh` by hand after a crash (and its time-derived rendezvous port made
even that flaky, SURVEY.md §5.3).
"""

from __future__ import annotations

import argparse
import logging
import signal
import subprocess
import sys
import time

RESTARTABLE = (75, -signal.SIGKILL)  # EX_TEMPFAIL, external SIGKILL


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="relaunch a command on restartable failures (exit 75 "
                    "from the step watchdog, SIGKILL), waiting for the "
                    "device to probe healthy between attempts")
    p.add_argument("--max-restarts", type=int, default=20)
    p.add_argument("--backoff", type=float, default=60.0,
                   help="seconds to sleep before each relaunch (on top of "
                        "the device health wait)")
    p.add_argument("--health-wait", type=float, default=3600.0,
                   help="max seconds to wait for a healthy device probe "
                        "before each relaunch (0 skips probing)")
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="the command to supervise (prefix with --)")
    args = p.parse_args(argv)
    cmd = args.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no command given (pass it after --)")
    args.command = cmd
    return args


def supervise(cmd, max_restarts: int = 20, backoff: float = 60.0,
              health_wait: float = 3600.0, _run=subprocess.run) -> int:
    """Run ``cmd`` until success / real failure / restart budget. Returns
    the final exit code. ``_run`` is injectable for tests."""
    from mrfp_tpu.utils.tpu_health import wait_until_healthy

    restarts = 0
    while True:
        t0 = time.monotonic()
        try:
            rc = _run(cmd).returncode
        except OSError as e:
            # unlaunchable command (typo, missing interpreter): a real
            # error, not a restartable one — clean exit, no traceback
            logging.error("supervise: cannot launch %r: %s", cmd[0], e)
            return 127
        if rc == 0:
            if restarts:
                logging.info("supervise: succeeded after %d restart(s)",
                             restarts)
            return 0
        if rc not in RESTARTABLE:
            logging.error("supervise: non-restartable exit %d after %.0fs — "
                          "propagating", rc, time.monotonic() - t0)
            return rc
        restarts += 1
        if restarts > max_restarts:
            logging.error("supervise: restart budget (%d) exhausted",
                          max_restarts)
            return rc
        logging.warning("supervise: restartable exit %d after %.0fs — "
                        "relaunch %d/%d", rc, time.monotonic() - t0,
                        restarts, max_restarts)
        if health_wait > 0:
            wait_until_healthy(max_wait_s=health_wait)
        if backoff > 0:
            time.sleep(backoff)


def main(argv=None) -> int:
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    return supervise(args.command, max_restarts=args.max_restarts,
                     backoff=args.backoff, health_wait=args.health_wait)


if __name__ == "__main__":
    sys.exit(main())
