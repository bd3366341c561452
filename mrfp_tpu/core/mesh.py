"""Device mesh and sharding helpers.

Replaces the reference's distributed substrate (NCCL process-group init at
main.py:42-52, nn.DataParallel at main.py:824, DDP wrapper at
network/__init__.py:30-38) with a single ``jax.sharding.Mesh``. Everything is
jit-compiled against NamedShardings; GSPMD inserts the ICI collectives that
NCCL provided in the reference (grad all-reduce, SyncBatchNorm moments,
SyncSwitchWhiten mean/cov reductions).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mrfp_tpu.core.config import MeshConfig


def create_mesh(cfg: Optional[MeshConfig] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    With ``model_parallel == 1`` this is a pure DP mesh — the parity
    configuration (the reference has no TP/PP/SP/EP; SURVEY.md §2.3).
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; rest replicated."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with batch dim sharded over 'data'.

    Multi-process: each process passes its LOCAL shard (DataLoader
    shard_rank/shard_count slicing) and the result is the global array —
    the jax.Array equivalent of DistributedSampler + NCCL-visible tensors
    (reference main.py:818).
    """
    multiproc = jax.process_count() > 1

    def put(x):
        sharding = batch_sharding(mesh, np.ndim(x))
        if multiproc:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate_state(mesh: Mesh, state):
    """Replicate a host-built pytree over the mesh. Multi-process safe:
    every process must hold identical host values (same seed), which is how
    all state is built here."""
    repl = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)), state)
    return jax.device_put(state, repl)
