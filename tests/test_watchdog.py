"""Step watchdog (utils/watchdog.py): failure detection for wedged device
execution. A wedged axon execute blocks forever with no exception; the
watchdog turns that into exit 75 + supervisor restart + checkpoint
auto-resume. These tests inject on_timeout to observe firing without
killing the test process."""

import threading
import time

from mrfp_tpu.utils.watchdog import StepWatchdog, watchdog_from_arg


def _make(timeout_s, first=0.0):
    fired = threading.Event()
    wd = StepWatchdog(timeout_s, first_beat_timeout_s=first,
                      on_timeout=fired.set, poll_s=0.05)
    return wd, fired


def test_fires_without_beats():
    wd, fired = _make(0.2)
    wd.start()
    assert fired.wait(5.0), "watchdog never fired with no heartbeat"
    wd.stop()


def test_beats_keep_it_alive_then_stop():
    wd, fired = _make(0.5)
    wd.start()
    for _ in range(6):
        time.sleep(0.2)
        wd.beat()
    assert not fired.is_set(), "fired despite regular heartbeats"
    wd.stop()
    time.sleep(0.8)
    assert not fired.is_set(), "fired after stop()"


def test_first_beat_window_is_generous():
    # steady window 0.2s, first-beat window 1.5s: the "compile" phase
    # (no beats yet) must survive past 0.2s
    wd, fired = _make(0.2, first=1.5)
    wd.start()
    time.sleep(0.7)
    assert not fired.is_set(), "fired during the first-beat grace window"
    wd.beat()  # first step done -> steady-state window takes over
    time.sleep(0.7)
    assert fired.wait(2.0), "never fired after steady-state window expired"
    wd.stop()


def test_exit_code_is_tempfail():
    assert StepWatchdog.EXIT_CODE == 75  # EX_TEMPFAIL: retry me


def test_default_action_hard_exits_75():
    # the real path: a "wedged" main thread (sleep) cannot be unwound, the
    # watchdog thread must take the whole process down with EX_TEMPFAIL
    import subprocess
    import sys
    src = ("import time\n"
           "from mrfp_tpu.utils.watchdog import StepWatchdog\n"
           "StepWatchdog(0.3, first_beat_timeout_s=0.3, poll_s=0.05,"
           " name='t').start()\n"
           "time.sleep(30)\n")
    p = subprocess.run([sys.executable, "-c", src], timeout=25,
                       capture_output=True, text=True)
    assert p.returncode == StepWatchdog.EXIT_CODE, (p.returncode, p.stderr)


def test_loop_beats_eagerly_after_launch():
    """run_training_loop must sync (and beat) at steps 1,2,4,8,... since
    launch when a watchdog is armed — NOT wait for the first log_every
    boundary — so a device that wedges right after compile is detected in
    the steady-state window instead of the compile-sized first-beat one."""
    import jax.numpy as jnp

    from mrfp_tpu.core.config import Config
    from mrfp_tpu.train.loop import run_training_loop

    class FakeState:
        step = 0

    class FakeLoader(list):
        def set_epoch(self, e):
            pass

    class FakeCkpt:
        def save(self, *a, **k):
            pass

        def wait(self):
            pass

    class FakeWriter:
        def add_scalar(self, *a):
            pass

    class BeatCounter:
        beats = 0

        def beat(self):
            self.beats += 1

        def stop(self):
            pass

    import dataclasses

    cfg = Config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, max_iter=10, checkpoint_every=1000,
        log_every=100))  # log_every never reached: only eager syncs beat

    def jtrain(state, images, labels):
        return state, {"loss": jnp.float32(1.0)}

    batch = {"image": jnp.zeros((1, 8, 8, 3)), "label": jnp.zeros((1, 8, 8),
                                                                  jnp.int32)}
    wd = BeatCounter()
    _, step, preempted = run_training_loop(
        FakeState(), FakeLoader([batch] * 4), jtrain, cfg, FakeCkpt(),
        FakeWriter(), watchdog=wd)
    assert step == 10 and not preempted
    # eager syncs at steps 1,2,4,8 + the final-checkpoint beat
    assert wd.beats == 5, wd.beats


def test_emergency_hook_runs_before_on_timeout():
    order = []
    wd, fired = _make(0.2)
    wd.set_emergency(lambda: order.append("emergency"))
    base = fired.set
    wd._on_timeout = lambda: (order.append("timeout"), base())
    wd.start()
    assert fired.wait(5.0)
    assert order == ["emergency", "timeout"]
    wd.stop()


def test_emergency_hook_failure_does_not_mask_exit():
    wd, fired = _make(0.2)
    wd.set_emergency(lambda: 1 / 0)
    wd.start()
    assert fired.wait(5.0), "on_timeout never ran after a failing hook"
    wd.stop()


_WEDGE_SCRIPT = """
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from mrfp_tpu.core.config import Config
from mrfp_tpu.train.checkpoint import CheckpointManager
from mrfp_tpu.train.loop import run_training_loop
from mrfp_tpu.train.state import TrainState
from mrfp_tpu.utils.watchdog import StepWatchdog

state = TrainState(step=jnp.zeros((), jnp.int32),
                   params={"w": jnp.arange(4.0)},
                   batch_stats={"m": jnp.zeros(2)}, oc_params=None,
                   opt_state={"t": jnp.zeros(3)},
                   base_key=jax.random.PRNGKey(0))
cfg = Config()
cfg = cfg.replace(train=dataclasses.replace(
    cfg.train, max_iter=50, log_every=1, checkpoint_every=1000))
ckpt = CheckpointManager(sys.argv[1])


class Loader(list):
    def set_epoch(self, e):
        pass


batch = {"image": jnp.zeros((1, 4, 4, 3)),
         "label": jnp.zeros((1, 4, 4), jnp.int32)}


def jtrain(state, images, labels):
    s = int(state.step) + 1
    if s >= 7:
        time.sleep(3600)  # wedged-device stand-in: blocks forever
    return (state.replace(step=jnp.full((), s, jnp.int32),
                          params={"w": state.params["w"] + 1}),
            {"loss": jnp.float32(s)})


wd = StepWatchdog(1.0, first_beat_timeout_s=10.0, poll_s=0.1).start()


class W:
    def add_scalar(self, *a):
        pass


run_training_loop(state, Loader([batch] * 4), jtrain, cfg, ckpt, W(),
                  watchdog=wd, snapshot_every=2)
"""


def test_wedged_step_exits_75_with_emergency_snapshot(tmp_path):
    """The gold path: steps 1-6 sync, step 7 wedges forever. The watchdog
    must take the process down with 75 AND persist the step-6 host snapshot
    through the checkpoint manager — auto-resume then loses one step, not
    the whole un-checkpointed run (checkpoint_every=1000 here)."""
    import os
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run([sys.executable, "-c", _WEDGE_SCRIPT, d], env=env,
                       timeout=180, capture_output=True, text=True)
    assert p.returncode == StepWatchdog.EXIT_CODE, (p.returncode, p.stderr)
    assert "persisting host snapshot of step 6" in p.stderr, p.stderr[-2000:]

    from mrfp_tpu.train.checkpoint import CheckpointManager
    from mrfp_tpu.train.state import TrainState
    mgr = CheckpointManager(d)
    assert mgr.latest_step() == 6
    template = TrainState(step=jnp.zeros((), jnp.int32),
                          params={"w": jnp.zeros(4)},
                          batch_stats={"m": jnp.zeros(2)}, oc_params=None,
                          opt_state={"t": jnp.zeros(3)},
                          base_key=jax.random.PRNGKey(0))
    restored = mgr.restore(template)
    assert int(restored.step) == 6
    assert jax.numpy.allclose(restored.params["w"],
                              jnp.arange(4.0) + 6)


def test_from_arg_policy(monkeypatch):
    # forced-CPU (the test env): auto means off
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert watchdog_from_arg(None) is None
    # explicit 0 disables everywhere
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert watchdog_from_arg(0) is None
    # explicit timeout: started watchdog with the compile-covering first
    # window, even off-TPU (a CPU soak can want one too)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    wd = watchdog_from_arg(10.0)
    try:
        assert wd is not None and wd.timeout_s == 10.0
        assert wd.first_beat_timeout_s == 3600.0
        assert wd._thread is not None and wd._thread.is_alive()
    finally:
        wd.stop()
    # auto on TPU platforms: on, 1800s
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    wd = watchdog_from_arg(None)
    try:
        assert wd is not None and wd.timeout_s == 1800.0
    finally:
        wd.stop()
