"""Shared training-loop driver for the CLI trainers.

Factored out of cli.train so the MRFP trainer (the working equivalent of the
reference's commented-out loop, main.py:844-871) and the zoo trainer
(cli.train_zoo, the RobustNet-style objective of network/deepv3.py:547-600)
run the exact same loop mechanics:

- epoch-dependent shuffle AND per-sample augmentation RNG via
  ``loader.set_epoch`` (reference: DistributedSampler.set_epoch + worker
  re-seeding),
- input pipeline overlapped with device steps (prefetch_to_device),
- throughput/loss logging into the JSONL metric stream,
- mid-train validation every ``eval_every`` iters feeding the best-by-mIoU
  checkpoint rotation (RobustNet harness, utils/misc.py:139-257),
- preemption-safe shutdown: SIGTERM/SIGINT finish the in-flight step, save a
  resumable checkpoint, and return — Orbax auto-resume picks it up on
  restart, so a pod preempted between checkpoint_every boundaries loses no
  work.
"""

from __future__ import annotations

import logging
import signal
import time

import jax


def run_training_loop(state, loader, jtrain, cfg, ckpt, writer, mesh=None,
                      eval_every: int = 0, run_validation=None,
                      watchdog=None, snapshot_every: int = 0):
    """Drive ``jtrain(state, images, labels) -> (state, metrics)`` to
    ``cfg.train.max_iter``. Returns ``(state, step, preempted)``; the final
    checkpoint (resumable either way) is already saved on return.

    ``watchdog`` (utils/watchdog.StepWatchdog, already started): beaten at
    every sync point — the log_every loss fetch, each finished validation,
    and the final checkpoint barrier — and stopped on normal return, so a
    wedged device execution exits 75 instead of hanging forever.

    With a watchdog armed, the first steps after (re)launch sync eagerly
    (steps 1, 2, 4, 8, ... since launch, until log_every takes over): the
    first beat then lands right after compilation instead of log_every
    steps later, so the watchdog leaves its generous first-beat window
    (sized for the multi-minute tunnel compile) within one step and a
    device that wedges AFTER compiling is detected in the steady-state
    window — minutes, not the compile budget. Cost: a handful of ~30 ms
    scalar fetches at launch.

    ``snapshot_every`` (requires a watchdog; single-process runs only —
    an emergency save in a multi-host job would hang on the Orbax
    barrier): every N steps, at a sync point, the full train state is
    fetched to HOST memory and registered as the watchdog's emergency
    hook. When the watchdog fires, the watchdog thread persists that
    snapshot through the normal checkpoint manager before exiting 75 —
    auto-resume then continues from the last *synced* step instead of the
    last scheduled checkpoint, so a device that wedges mid-window loses
    at most ``snapshot_every`` steps of work. Cost per snapshot: one
    state-sized device->host fetch (~100 MB-class for ResNet-18/50)."""
    from mrfp_tpu.data.loader import prefetch_to_device
    from mrfp_tpu.utils import AverageMeter

    loss_meter = AverageMeter()
    t_last = time.perf_counter()
    step = int(state.step)
    steps_per_epoch = max(1, len(loader))
    metrics_for_ckpt = None
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True
        logging.warning("signal %d: checkpoint-and-exit after this step",
                        signum)

    prev_handlers = [(s, signal.signal(s, _on_signal))
                     for s in (signal.SIGTERM, signal.SIGINT)]
    steps_this_run, next_early_sync = 0, 1
    if snapshot_every and (watchdog is None or jax.process_count() > 1):
        logging.warning("snapshot_every ignored (needs a watchdog and a "
                        "single-process run)")
        snapshot_every = 0
    last_snapshot_step = step

    def _snapshot_if_due(step, state):
        nonlocal last_snapshot_step
        if not snapshot_every or step - last_snapshot_step < snapshot_every:
            return
        # at a sync point the step's outputs are materialized on device;
        # fetch them to host NOW — once the device wedges it is too late
        snap = jax.device_get(state)
        last_snapshot_step = step

        def _emergency_save(snap=snap, step=step):
            logging.critical("watchdog: persisting host snapshot of "
                             "step %d before exit", step)
            ckpt.wait()  # drain any in-flight async save first
            ckpt.save(snap, is_coordinator=True)
            ckpt.wait()

        watchdog.set_emergency(_emergency_save)
    while step < cfg.train.max_iter and not preempted["flag"]:
        epoch = step // steps_per_epoch
        loader.set_epoch(epoch)
        for batch in prefetch_to_device(iter(loader), mesh):
            # batches cross host->device in the loader's wire dtype (uint8
            # for every active pipeline — 4x fewer tunnel/PCIe bytes); the
            # jitted step casts on device, bit-exactly
            state, metrics = jtrain(state, batch["image"], batch["label"])
            step += 1
            steps_this_run += 1
            if watchdog is not None and steps_this_run == next_early_sync \
                    and steps_this_run <= cfg.train.log_every \
                    and step % cfg.train.log_every != 0:
                # eager early-launch sync: prove device progress ASAP so the
                # watchdog drops from its compile-sized first-beat window to
                # the steady-state one (docstring)
                next_early_sync *= 2
                float(metrics["loss"])
                watchdog.beat()
                _snapshot_if_due(step, state)
            if step % cfg.train.log_every == 0:
                loss = float(metrics["loss"])  # sync point
                if watchdog is not None:
                    watchdog.beat()
                _snapshot_if_due(step, state)
                loss_meter.update(loss)
                dt = (time.perf_counter() - t_last) / cfg.train.log_every
                t_last = time.perf_counter()
                ips = cfg.data.batch_size / dt
                logging.info("iter %d loss %.4f  %.1f img/s", step, loss, ips)
                writer.add_scalar("train/loss", loss, step)
                writer.add_scalar("train/images_per_sec", ips, step)
                for name in ("loss_aux", "loss_wt"):
                    if name in metrics:
                        writer.add_scalar(f"train/{name}",
                                          float(metrics[name]), step)
            if eval_every and step % eval_every == 0:
                metrics_for_ckpt = run_validation(state, step)
                if watchdog is not None:
                    watchdog.beat()
                t_last = time.perf_counter()  # don't count eval in img/s
            if step % cfg.train.checkpoint_every == 0 or \
                    step >= cfg.train.max_iter - 20:
                ckpt.save(state, metrics=metrics_for_ckpt,
                          is_coordinator=jax.process_index() == 0)
                metrics_for_ckpt = None  # only fresh val scores rotate best
                last_snapshot_step = step  # durable; snapshot is redundant
            if step >= cfg.train.max_iter or preempted["flag"]:
                break
    for s, h in prev_handlers:
        signal.signal(s, h)
    if eval_every and not preempted["flag"]:
        metrics_for_ckpt = run_validation(state, step)
    ckpt.save(state, metrics=metrics_for_ckpt,
              is_coordinator=jax.process_index() == 0)
    ckpt.wait()
    if watchdog is not None:
        watchdog.beat()
        watchdog.stop()
    logging.info("%s at step %d",
                 "preempted (resumable)" if preempted["flag"] else "done",
                 step)
    return state, step, preempted["flag"]
