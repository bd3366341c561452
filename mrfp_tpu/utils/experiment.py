"""Experiment harness — working replacement for the reference's
import-broken utils/misc.py (its `import datasets` at misc.py:15 references a
module that does not exist, SURVEY.md §2.2 #37).

Provides: experiment-name mangling from the config (misc.py:24-63), per-run
directory setup + logging config (misc.py:75-117), and a CSV/JSONL metric
writer standing in for tensorboardX (the env has no TB writer; the format is
trivially importable into TB offline).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import signal
from typing import Any, Dict


def enable_persistent_compile_cache() -> None:
    """Point JAX at an on-disk compilation cache (MRFP_JAX_CACHE overrides,
    set empty to disable). First compile of the 768^2 train step is ~5 min
    through the axon tunnel, and a cached program also survives remote
    compile-helper rolls that later crash on the same graph (observed
    2026-08-17: a helper update SIGSEGVs on fresh AOT compiles of the
    cond-gated MRFP+ step at small crops while cached executables keep
    running).

    The default lives in a per-user 0700 directory (cache entries are
    deserialized and executed — a world-shared path would let another
    local user plant executables, the same hazard class data/_native
    guards against)."""
    import tempfile

    cache = os.environ.get(
        "MRFP_JAX_CACHE",
        os.path.join(tempfile.gettempdir(),
                     f"mrfp_tpu_jax_cache-{os.getuid()}"))
    if not cache:
        return
    os.makedirs(cache, mode=0o700, exist_ok=True)
    if os.stat(cache).st_uid != os.getuid():
        return  # pre-planted by someone else: run uncached rather than trust
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def make_exp_name(cfg) -> str:
    """Compact run name from the salient knobs (misc.py:24-63 spirit)."""
    m, p, t = cfg.model, cfg.perturb, cfg.train
    bits = [m.trunk.replace("-", ""), m.variant,
            "wt" + "".join(str(x) for x in m.wt_layer)]
    if p.enabled:
        bits.append(f"mrfp{'p' if m.hrfp_plus else ''}")
    bits += [f"bs{cfg.data.batch_size}", f"lr{t.lr:g}", f"it{t.max_iter}"]
    return "_".join(bits)


def enable_stack_dumps() -> None:
    """SIGUSR1 -> dump every thread's Python stack to stderr (faulthandler).

    Production debuggability for the failure modes that matter here: a
    wedged device call, a stuck data pipeline, a deadlocked pool — all
    present as 'process sleeping, zero progress', and `kill -USR1 <pid>`
    answers *where* without attaching a debugger or restarting. No-op on
    platforms without SIGUSR1."""
    import faulthandler
    try:
        # chain=False: SIGUSR1's default disposition is terminate — the
        # whole point is to inspect a LIVE process
        faulthandler.register(signal.SIGUSR1, all_threads=True, chain=False)
    except (AttributeError, ValueError):  # no SIGUSR1 / non-main thread
        pass


def save_log(prefix: str, output_dir: str, rank: int = 0) -> None:
    """File+console logging (misc.py:75-90): one log file per process."""
    fmt = "%(asctime)s.%(msecs)03d %(message)s"
    date_fmt = "%m-%d %H:%M:%S"
    stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    filename = os.path.join(output_dir, f"{prefix}_{stamp}_rank_{rank}.log")
    os.makedirs(output_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO, format=fmt, datefmt=date_fmt,
                        filename=filename, filemode="w", force=True)
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter(fmt=fmt, datefmt=date_fmt))
    logging.getLogger("").addHandler(console)


class MetricWriter:
    """Scalar metric writer (the tensorboardX role, misc.py:115,249-254).

    Writes two sinks per scalar: a JSONL stream (greppable, no tooling
    needed) and a real tfevents file (utils.tbevents, pure-Python encoder)
    that stock TensorBoard loads with ``tensorboard --logdir <run>/tb``."""

    def __init__(self, path: str, tb_dir: str | None = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self._tb = None
        if tb_dir is not None:
            from mrfp_tpu.utils.tbevents import TBEventWriter
            self._tb = TBEventWriter(tb_dir)

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def prep_experiment(cfg, root: str = "./runs", rank: int = 0) -> Dict[str, Any]:
    """Create run dirs + logging + writer (misc.py:94-117).

    ``rank``: the process index in a multi-process run. Every rank gets its
    own log file and JSONL stream (same-path appends from several processes
    interleave), and only rank 0 writes the tfevents file — the tbevents
    record framing cannot tolerate concurrent writers and the scalars are
    identical on every rank anyway (all-gathered validation, synced loss)."""
    name = make_exp_name(cfg)
    exp_dir = os.path.join(root, name)
    ckpt_dir = os.path.join(exp_dir, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_log("log", exp_dir, rank=rank)
    enable_stack_dumps()  # kill -USR1 <pid> -> all-thread Python stacks
    suffix = "" if rank == 0 else f"_rank{rank}"
    writer = MetricWriter(
        os.path.join(exp_dir, f"metrics{suffix}.jsonl"),
        tb_dir=os.path.join(exp_dir, "tb") if rank == 0 else None)
    return {"name": name, "exp_dir": exp_dir, "ckpt_dir": ckpt_dir,
            "writer": writer}
