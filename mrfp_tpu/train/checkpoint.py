"""Checkpoint / resume via Orbax.

Replaces the reference's torch.save of {'epoch','state_dict','optimizer'}
every one of the last 20 iters + per-epoch '_latest.pth' (main.py:867-869)
and the RobustNet best/last rotation (utils/misc.py:162-231) with:

- async Orbax saves of the full TrainState (params, batch_stats, oc_params,
  optimizer state, step, base RNG key) every N steps,
- automatic latest-step resume (the reference's time-derived rendezvous port
  made restarts flaky, SURVEY.md §5.3 — here resume is one call),
- best-by-mIoU retention alongside the rolling window. The best value/step
  are persisted to ``best/metric.json`` so a restart cannot regress ``best/``
  (the RobustNet harness stores the best metric inside its checkpoint dict,
  utils/misc.py:162-231; here it rides the run dir).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp

from mrfp_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 best_metric: str = "mean_iu"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            best_fn=None,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self.best_metric = best_metric
        self._best_value = -np.inf
        self._best_step: Optional[int] = None
        self._load_best_record()

    # -- best-metric persistence ------------------------------------------
    @property
    def _best_record_path(self) -> str:
        return os.path.join(self.directory, "best", "metric.json")

    def _load_best_record(self):
        """Restore the best value/step from the run dir (restart safety)."""
        try:
            with open(self._best_record_path) as f:
                rec = json.load(f)
            self._best_value = float(rec["value"])
            self._best_step = rec.get("step")
        except (OSError, ValueError, KeyError):
            pass

    def _write_best_record(self, step: int):
        tmp = self._best_record_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"metric": self.best_metric,
                       "value": float(self._best_value),
                       "step": step}, f)
        os.replace(tmp, self._best_record_path)

    def save(self, state: TrainState, metrics: Optional[dict] = None,
             is_coordinator: bool = True):
        """Save a rolling checkpoint and rotate ``best/`` on a new best.

        ``is_coordinator``: in a multi-process run the Orbax saves are
        COLLECTIVE (Checkpointer.save opens with a global process barrier
        and every process writes its addressable shards), so every process
        must call this with the SAME metrics (the sharded validation's
        all-gathered mIoU is identical on all ranks); only the plain
        filesystem ops — the best-dir rotation and metric.json — are gated
        on the coordinator.
        """
        step = int(state.step)
        if step not in (self._mgr.all_steps() or []):
            self._mgr.save(step, args=ocp.args.StandardSave(state))
        if metrics and metrics.get(self.best_metric, -np.inf) > self._best_value:
            self._best_value = metrics[self.best_metric]
            self._best_step = step
            best_dir = os.path.join(self.directory, "best")
            # Crash-safe rotation order: save the NEW best first (alongside
            # the previous one), commit, update metric.json, THEN delete the
            # old step dir. A crash anywhere in the window leaves at worst
            # two best checkpoints and a metric.json naming a committed one
            # — never an empty best/ whose record reset to -inf (the old
            # rmtree-first order lost every best on a mid-save SIGKILL).
            # The rotation itself mirrors utils/misc.py:162-231 (one best
            # checkpoint at a time).
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.join(best_dir, f"step_{step}"), state,
                       force=True)
            # block until committed: metric.json must never describe a
            # best/ that a crash could leave half-written
            ckptr.wait_until_finished()
            if is_coordinator:
                self._write_best_record(step)
                import shutil
                for name in os.listdir(best_dir):
                    if name.startswith("step_") and name != f"step_{step}":
                        shutil.rmtree(os.path.join(best_dir, name),
                                      ignore_errors=True)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> Optional[TrainState]:
        """Restore the given (or latest) step into the template's structure;
        returns None when no checkpoint exists (fresh start)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
