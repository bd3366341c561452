"""Checkpoint / resume via Orbax.

Replaces the reference's torch.save of {'epoch','state_dict','optimizer'}
every one of the last 20 iters + per-epoch '_latest.pth' (main.py:867-869)
and the RobustNet best/last rotation (utils/misc.py:162-231) with:

- async Orbax saves of the full TrainState (params, batch_stats, oc_params,
  optimizer state, step, base RNG key) every N steps,
- automatic latest-step resume (the reference's time-derived rendezvous port
  made restarts flaky, SURVEY.md §5.3 — here resume is one call),
- best-by-mIoU retention alongside the rolling window.
"""

from __future__ import annotations

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

    def save(self, state: TrainState, metrics: Optional[dict] = None):
        step = int(state.step)
        if step not in (self._mgr.all_steps() or []):
            self._mgr.save(step, args=ocp.args.StandardSave(state))
        if metrics and metrics.get(self.best_metric, -np.inf) > self._best_value:
            self._best_value = metrics[self.best_metric]
            best_dir = os.path.join(self.directory, "best")
            # rotation: one best checkpoint at a time (utils/misc.py:162-231
            # deletes the previous best .pth the same way)
            if os.path.isdir(best_dir):
                import shutil
                shutil.rmtree(best_dir)
            ocp.StandardCheckpointer().save(
                os.path.join(best_dir, f"step_{step}"), state, force=True)

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
