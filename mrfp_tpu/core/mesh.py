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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mrfp_tpu.core.config import MeshConfig


def create_mesh(cfg: Optional[MeshConfig] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 3-D (data, model, spatial) mesh over the available devices.

    With ``model_parallel == spatial_parallel == 1`` this is a pure DP mesh —
    the parity configuration (the reference has no TP/PP/SP/EP; SURVEY.md
    §2.3). ``spatial_parallel > 1`` shards image H across chips: GSPMD halo-
    exchanges conv borders over ICI, SyncBN/NP+ moments and the loss mean
    reduce over (data × spatial), and the math stays device-count invariant
    (tests/test_spatial.py).
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    sp = max(1, cfg.spatial_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // (mp * sp)
    if dp * mp * sp != n:
        raise ValueError(f"mesh {dp}x{mp}x{sp} != {n} devices")
    dev_array = np.asarray(devices).reshape(dp, mp, sp)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis, cfg.spatial_axis))


def _spatial_axis(mesh: Mesh) -> Optional[str]:
    """The mesh's spatial axis name, or None if absent/size-1 (pure DP)."""
    if len(mesh.axis_names) >= 3:
        name = mesh.axis_names[2]
        if mesh.shape[name] > 1:
            return name
    return None


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard batch over 'data' and, when the mesh has a >1 spatial axis,
    image H (dim 1 of NHWC / NHW) over 'spatial'; rest replicated."""
    rest = [None] * (ndim - 1)
    sp = _spatial_axis(mesh)
    if sp is not None and ndim >= 3:
        rest[0] = sp
    spec = P(mesh.axis_names[0], *rest)
    return NamedSharding(mesh, spec)


def spatial_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch replicated, image H sharded over 'spatial' — the batch-1 eval
    sharding: one full-res image split across chips, conv halos over ICI.
    Falls back to fully replicated on a mesh without a >1 spatial axis."""
    rest = [None] * (ndim - 1)
    sp = _spatial_axis(mesh)
    if sp is not None and ndim >= 3:
        rest[0] = sp
    return NamedSharding(mesh, P(None, *rest))


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


def _model_axis(mesh: Mesh) -> Optional[str]:
    """The mesh's model (tensor) axis name, or None if absent/size-1."""
    if len(mesh.axis_names) >= 2:
        name = mesh.axis_names[1]
        if mesh.shape[name] > 1:
            return name
    return None


def _tp_spec(x, mp: int, axis: str):
    """Channel-sharding rule for one leaf, by shape/dtype alone.

    Tensor parallelism for a fully-convolutional net: shard the CHANNEL
    dimension. Conv kernels (HWIO) and dense kernels shard their output
    features; 1-D per-channel vectors (BN scale/bias/running stats, biases)
    shard their only dim. Anything non-float (step counters, PRNG keys) or
    not divisible by the axis size stays replicated — GSPMD reshards at any
    producer/consumer mismatch, so this rule only has to be *consistent*,
    not complete (the classifier's 19-ch tensors, e.g., stay replicated).
    """
    shape = np.shape(x)
    dt = getattr(x, "dtype", None)
    if dt is None or not jnp.issubdtype(dt, jnp.floating):
        return P()
    if len(shape) >= 2 and shape[-1] % mp == 0 and shape[-1] >= mp:
        return P(*([None] * (len(shape) - 1)), axis)
    if len(shape) == 1 and shape[0] % mp == 0 and shape[0] >= mp:
        return P(axis)
    return P()


def state_shardings(mesh: Mesh, tree):
    """Per-leaf NamedShardings for a train-state pytree.

    On a mesh whose 'model' axis is >1, float channel tensors (params, their
    optimizer momentum mirrors, BN stats) shard over 'model' per _tp_spec —
    the memory side of tensor parallelism (params + momentum no longer
    replicated per chip). The frozen OC-branch params stay replicated: they
    are tiny (~1.5 M) and re-randomized in-graph from a replicated key
    (perturb/oc_branch.py), so sharding them buys nothing and costs a
    reshard at every resample. On a pure-DP/SP mesh: everything replicated
    (the parity configuration).
    """
    axis = _model_axis(mesh)
    if axis is None:
        repl = replicated(mesh)
        return jax.tree_util.tree_map(lambda x: repl, tree)
    mp = mesh.shape[axis]

    def leaf(path, x):
        if any("oc_params" in (getattr(p, "name", None),
                               getattr(p, "key", None)) for p in path):
            return replicated(mesh)
        return NamedSharding(mesh, _tp_spec(x, mp, axis))

    return jax.tree_util.tree_map_with_path(leaf, tree)


def shard_state(mesh: Mesh, state):
    """Device-put a host-built state pytree with state_shardings(mesh).

    Drop-in for replicate_state that additionally implements the tensor-
    parallel placement when the mesh has a >1 'model' axis. Multi-process
    safe: every process holds the identical full host value (same seed) and
    each device receives exactly its shard.
    """
    shardings = state_shardings(mesh, state)
    if jax.process_count() > 1:
        def put(x, s):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, s, lambda idx: arr[idx])
        return jax.tree_util.tree_map(put, state, shardings)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
