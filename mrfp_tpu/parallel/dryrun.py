"""Self-contained multi-chip sharding dry run.

The driver validates the multi-chip path by running ``dryrun_multichip(n)``
on a single-chip host. Round 1 failed because the dry run inherited the
ambient ``JAX_PLATFORMS=axon`` (a live TPU tunnel with a libtpu AOT version
skew) instead of a virtual CPU mesh. The launcher here therefore re-executes
itself in a subprocess with a forced n-device CPU platform — independent of
whatever platform the calling process already initialized jax on.

Replaces (as machine-checked evidence) the reference's NCCL substrate:
process-group rendezvous at main.py:42-52, DDP wrap network/__init__.py:30-38,
SyncBN/SyncSwitchWhiten cross-replica reductions sync_switchwhiten.py:22-45.
Here all of those are one jit over a ``jax.sharding.Mesh``; GSPMD inserts the
grad all-reduce and the global-batch moment reductions.
"""

from __future__ import annotations

import os
import subprocess
import sys


def launch(n_devices: int) -> None:
    """Run the dry run in a subprocess pinned to an n-device CPU platform.

    Never touches jax in the calling process (which may already hold a TPU
    backend). PYTHONPATH is extended, not overwritten — the environment's
    plugin registrations must survive.
    """
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The environment's sitecustomize registers the TPU plugin at interpreter
    # startup whenever this var is set, and the registration overrides
    # JAX_PLATFORMS (jax.config.update('jax_platforms', 'axon,cpu')). The dry
    # run is CPU-only by design — don't register the plugin at all.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    xla_flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (
        f"{xla_flags} --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo_root + (os.pathsep + pp if pp else "")

    proc = subprocess.run(
        [sys.executable, "-m", "mrfp_tpu.parallel.dryrun", str(n_devices)],
        env=env,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"dryrun_multichip({n_devices}) subprocess failed "
            f"(rc={proc.returncode})")


def run(n_devices: int) -> float:
    """The dry run body: jit the FULL MRFP+ train step (perturbation gates,
    OC resampling, NP+ batch statistics, SyncBN via GSPMD) over an n-device
    mesh, execute one step on tiny shapes, and assert the first-step loss is
    invariant to device count (n-device mesh vs 1-device mesh).

    Must run in a process whose jax platform really has >= n devices; the
    mesh itself is asserted to span exactly n.
    """
    import jax

    devices = jax.devices()
    assert len(devices) >= n_devices, (
        f"platform has {len(devices)} devices, need {n_devices} "
        f"(platform={jax.default_backend()}); launch() forces this via "
        f"--xla_force_host_platform_device_count")

    import numpy as np
    from mrfp_tpu.core.config import Config, MeshConfig
    from mrfp_tpu.core.mesh import create_mesh, shard_batch, shard_state
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps

    cfg = Config()
    model = MRFP(trunk="resnet-50", variant="D16")
    batch, hw = 2 * n_devices, 64
    rng = np.random.default_rng(0)
    images = rng.standard_normal((batch, hw, hw, 3)).astype(np.float32)
    labels = rng.integers(0, 19, (batch, hw, hw)).astype(np.int32)

    def one_step(n: int, spatial: int = 1, tensor: int = 1) -> float:
        mesh = create_mesh(
            MeshConfig(model_parallel=tensor, spatial_parallel=spatial),
            devices[:n])
        assert mesh.devices.size == n, f"mesh has {mesh.devices.size} != {n}"
        state = create_train_state(model, cfg.train, (1, hw, hw, 3),
                                   oc_params=oc_init(jax.random.PRNGKey(1)))
        # replicated on a dp/sp mesh; channel tensors sharded over 'model'
        # on a tp mesh (core/mesh.py state_shardings)
        state = shard_state(mesh, state)
        imgs, lbls = shard_batch(mesh, (images, labels))
        assert len(imgs.sharding.device_set) == n, "batch not sharded over mesh"
        jtrain, _ = make_jitted_steps(model, cfg, mesh)
        new_state, metrics = jtrain(state, imgs, lbls)
        loss = float(metrics["loss"])  # fetch = sync (block_until_ready lies
        # on some backends, CLAUDE.md)
        assert np.isfinite(loss), "non-finite loss in dry run"
        del new_state
        return loss

    loss_n = one_step(n_devices)
    loss_1 = one_step(1)
    # device-count invariance: SyncBN/NP+/grad reductions are global-batch,
    # so sharding must not change the math (SURVEY §2.3 north star)
    assert abs(loss_n - loss_1) <= 1e-4 * max(1.0, abs(loss_1)), (
        f"loss not device-count invariant: {n_devices}-dev {loss_n!r} "
        f"vs 1-dev {loss_1!r}")
    loss_sp = loss_tp = None
    if n_devices >= 4 and n_devices % 2 == 0:
        # dp x sp mesh: image H sharded 2-way (GSPMD conv halo exchange,
        # core/mesh.py) — the same step must stay invariant
        loss_sp = one_step(n_devices, spatial=2)
        assert abs(loss_sp - loss_1) <= 1e-4 * max(1.0, abs(loss_1)), (
            f"loss not invariant under spatial sharding: "
            f"{n_devices // 2}x2 {loss_sp!r} vs 1-dev {loss_1!r}")
        # dp x tp mesh: conv channels + BN stats + momentum sharded 2-way
        # over 'model' (tensor parallelism, tests/test_tensor_parallel.py)
        loss_tp = one_step(n_devices, tensor=2)
        assert abs(loss_tp - loss_1) <= 1e-4 * max(1.0, abs(loss_1)), (
            f"loss not invariant under tensor sharding: "
            f"{n_devices // 2}x2(tp) {loss_tp!r} vs 1-dev {loss_1!r}")

    def _fmt(v):
        return "skipped" if v is None else format(v, ".6f")

    print(f"dryrun_multichip({n_devices}): loss={loss_n:.6f} "
          f"(1-dev {loss_1:.6f}, dpxsp {_fmt(loss_sp)}, dpxtp {_fmt(loss_tp)}) "
          f"devices={len(devices)} platform={jax.default_backend()} ok")
    return loss_n


def launch_multiprocess(n_processes: int = 2, devices_per_proc: int = 2,
                        port: int = 47621, timeout: float = 600.0):
    """Spawn an n-process jax.distributed CPU cluster and run one sharded
    train step in every process; assert all processes agree on the loss.

    This is the machine-checked stand-in for a multi-host pod run: the same
    code path as cli/train.py (initialize_distributed -> global mesh ->
    per-process batch shards -> GSPMD collectives). Returns the losses.
    """
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = []
    for rank in range(n_processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)  # see launch()
        xla_flags = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (
            f"{xla_flags} --xla_force_host_platform_device_count="
            f"{devices_per_proc}").strip()
        pp = env.get("PYTHONPATH", "")
        env["PYTHONPATH"] = repo_root + (os.pathsep + pp if pp else "")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mrfp_tpu.parallel.dryrun", "--mp",
             str(rank), str(n_processes), str(port), str(devices_per_proc)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    losses, mious = [], []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"rank {rank} failed (rc={p.returncode}):\n{out[-3000:]}")
        for line in out.splitlines():
            if line.startswith("MP_LOSS "):
                losses.append(float(line.split()[1]))
            if line.startswith("MP_MIOU "):
                mious.append(float(line.split()[1]))
    assert len(losses) == n_processes, f"missing loss lines:\n{outs}"
    assert max(losses) - min(losses) <= 1e-6 * max(1.0, abs(losses[0])), losses
    assert len(mious) == n_processes, f"missing miou lines:\n{outs}"
    assert max(mious) == min(mious), f"ranks disagree on merged mIoU: {mious}"
    return losses


def run_multiprocess(rank: int, n_processes: int, port: int,
                     devices_per_proc: int) -> None:
    """Child body for launch_multiprocess: one process of the CPU cluster."""
    import jax

    # cross-process CPU collectives need gloo (the default impl is
    # single-process only)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from mrfp_tpu.parallel.dist import initialize_distributed

    multi = initialize_distributed(f"localhost:{port}", n_processes, rank)
    assert multi and jax.process_count() == n_processes, (
        jax.process_count(), n_processes)
    n_global = n_processes * devices_per_proc
    assert len(jax.devices()) == n_global, len(jax.devices())

    import numpy as np
    from mrfp_tpu.core.config import Config, MeshConfig
    from mrfp_tpu.core.mesh import create_mesh, replicate_state, shard_batch
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps

    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    hw, per_proc_bs = 32, 2
    mesh = create_mesh(MeshConfig())
    # identical host-side state in every process (same seed), replicated
    state = create_train_state(model, cfg.train, (1, hw, hw, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    state = replicate_state(mesh, state)

    # each process holds its disjoint slice of the global batch
    rng = np.random.default_rng(0)
    g_images = rng.standard_normal(
        (n_processes * per_proc_bs, hw, hw, 3)).astype(np.float32)
    g_labels = rng.integers(
        0, 19, (n_processes * per_proc_bs, hw, hw)).astype(np.int32)
    lo = rank * per_proc_bs
    images, labels = shard_batch(
        mesh, (g_images[lo:lo + per_proc_bs], g_labels[lo:lo + per_proc_bs]))

    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    new_state, metrics = jtrain(state, images, labels)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # Sharded multi-host validation (reference eval loop main.py:876-913,
    # which every DDP rank would duplicate in full): each process scores a
    # disjoint stride of the val set, partial hists merge via all-gather.
    # The merged result must equal a full single-process sweep EXACTLY
    # (integer histogram addition commutes).
    from mrfp_tpu.data.datasets import SyntheticDataset
    from mrfp_tpu.train.evaluator import SegEvaluator

    val = SyntheticDataset(length=5, hw=(hw, hw), seed=7)
    ev = SegEvaluator(model, new_state.params, new_state.batch_stats)
    quiet = lambda *a, **k: None
    sharded = ev.run(val, log=quiet, shard_rank=rank,
                     shard_count=n_processes)
    full = ev.run(val, log=quiet)  # every process sweeps all 5 images
    assert np.array_equal(sharded["hist"], full["hist"]), (
        "sharded-merged hist != full-sweep hist")
    print(f"MP_LOSS {loss!r} rank={rank} procs={jax.process_count()} "
          f"devices={n_global}", flush=True)
    print(f"MP_MIOU {sharded['mean_iu']!r} rank={rank}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--mp":
        run_multiprocess(int(sys.argv[2]), int(sys.argv[3]),
                         int(sys.argv[4]), int(sys.argv[5]))
    else:
        run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
