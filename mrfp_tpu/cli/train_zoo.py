"""RobustNet-style zoo training entry point.

The reference vendors the whole DeepV3Plus zoo (network/deepv3.py:103-779)
and its ISW/IRW whitening machinery, but the train harness it came with is
import-broken (utils/misc.py:15 imports a nonexistent module) — the zoo is
trainable upstream only by reassembling RobustNet. This CLI is the working
launch surface for that capability:

    python -m mrfp_tpu.cli.train_zoo --arch DeepR50V3PlusD \
        --wt-layer 0 0 2 2 2 0 0 --use-wtloss \
        --source gtav --data-root /data --batch-size 8

Objective per step (train/zoo_step.py, network/deepv3.py:547-600):
CE(main) + 0.4*CE(DSN aux) + wt_reg_weight * ISW/IRW whitening loss. For ISW
(wt code 2) a statistics phase runs first: pairs of differently-augmented
views of the same images accumulate the variance-of-covariance per
instrumented layer (deepv3.py:478-545), k-means picks the sensitive
covariance entries, and the frozen masks feed the train step.

Shares the loop mechanics (resume, preemption safety, mid-train validation,
best-checkpoint rotation, multi-host sharding) with cli.train via
train.loop.run_training_loop.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="mrfp_tpu zoo (RobustNet) trainer")
    # architecture: a reference factory name, or explicit trunk+variant
    p.add_argument("--arch", default=None,
                   help="reference factory name (DeepR50V3PlusD, "
                        "DeepMobileNetV3PlusD, ... — network/deepv3.py:606-779); "
                        "overrides --trunk/--variant")
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    p.add_argument("--wt-layer", type=int, nargs=7, metavar="W",
                   default=[0, 0, 0, 0, 0, 0, 0],
                   help="7-slot whitening plan (0 none, 1 IRW, 2 ISW, "
                        "3/4 InstanceNorm, 5 SwitchWhiten)")
    p.add_argument("--use-wtloss", action="store_true",
                   help="ISW/IRW whitening regularizer (needs wt codes 1/2)")
    p.add_argument("--wt-reg-weight", type=float, default=0.6)
    p.add_argument("--relax-denom", type=float, default=0.0)
    p.add_argument("--clusters", type=int, default=50,
                   help="k-means clusters for ISW mask selection "
                        "(network/cov_settings.py:52-82)")
    p.add_argument("--covstat-batches", type=int, default=4,
                   help="ISW statistics phase: number of view-pair batches")
    p.add_argument("--use-dsn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="auxiliary DSN head on layer3 (zoo default ON, "
                        "network/deepv3.py:417-424)")
    p.add_argument("--aux-weight", type=float, default=0.4)
    # shared data/training knobs (same semantics as cli.train)
    p.add_argument("--source", default="gtav")
    p.add_argument("--data-root", default="/data")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--crop-size", type=int, default=768)
    p.add_argument("--max-iter", type=int, default=40000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--random-flip", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--color-jitter", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--gaussian-blur", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--scale-range", type=float, nargs=2, default=(0.5, 2.0),
                   metavar=("MIN", "MAX"))
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--eval-every", type=int, default=0)
    p.add_argument("--eval-max-images", type=int, default=None)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--step-timeout", type=float, default=None,
                   help="exit 75 (restartable) when no step syncs for this "
                        "many seconds; default 1800 on TPU, off elsewhere; "
                        "0 disables")
    p.add_argument("--first-beat-timeout", type=float, default=None,
                   help="window for the FIRST step sync (covers compile); "
                        "default max(2x step-timeout, 3600). See cli.train")
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="host-snapshot the state every N steps for the "
                        "watchdog's emergency checkpoint; see cli.train")
    p.add_argument("--runs-dir", default="./runs")
    p.add_argument("--coordinator-address", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--data-parallel", type=int, default=-1)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--spatial-parallel", type=int, default=1)
    return p.parse_args()


def build_config(args):
    from mrfp_tpu.core.config import Config, MeshConfig

    cfg = Config()
    if args.arch:
        # factory names pin trunk+variant; reflect them into the config so
        # the experiment name / checkpoints self-describe
        from mrfp_tpu.models.deepv3_zoo import MODEL_REGISTRY
        probe = MODEL_REGISTRY[args.arch]() if args.arch in MODEL_REGISTRY \
            else None
        if probe is None:
            raise SystemExit(f"unknown --arch {args.arch!r}")
        args.trunk, args.variant = probe.trunk, probe.variant
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, trunk=args.trunk, variant=args.variant,
            wt_layer=tuple(args.wt_layer), use_wtloss=args.use_wtloss,
            use_dsn_aux=args.use_dsn, relax_denom=args.relax_denom,
            clusters=args.clusters, wt_reg_weight=args.wt_reg_weight),
        perturb=dataclasses.replace(cfg.perturb, enabled=False),
        data=dataclasses.replace(
            cfg.data, source=args.source, batch_size=args.batch_size,
            crop_size=args.crop_size, base_size=args.crop_size,
            random_flip=args.random_flip,
            color_jitter=(cfg.data.color_jitter if args.color_jitter
                          else None),
            gaussian_blur=args.gaussian_blur,
            scale_range=tuple(args.scale_range)),
        train=dataclasses.replace(
            cfg.train, max_iter=args.max_iter, lr=args.lr, seed=args.seed,
            checkpoint_every=args.ckpt_every, log_every=args.log_every),
        mesh=MeshConfig(data_parallel=args.data_parallel,
                        model_parallel=args.model_parallel,
                        spatial_parallel=args.spatial_parallel),
    )
    return cfg


def build_view_pairs(dataset, n_batches: int, batch_size: int, seed: int):
    """ISW statistics inputs: pairs of differently-augmented views of the
    SAME images. The per-sample augmentation RNG is keyed on
    (seed, epoch, index) (data/datasets.py), so fetching the same indices
    under two distinct epochs yields two photometric views of each image —
    the role RobustNet's doubled color-jitter pipeline plays upstream
    (deepv3.py:481-482 concatenates the two views)."""
    n = min(len(dataset), n_batches * batch_size)
    idx = list(range(n))

    def grab(epoch):
        if hasattr(dataset, "set_epoch"):
            dataset.set_epoch(epoch)
        return [dataset[i] for i in idx]

    va, vb = grab(1000003), grab(1000007)
    rng = np.random.default_rng(seed)
    pairs = []
    for k in range(0, n, batch_size):
        a = np.stack([s["image"] for s in va[k:k + batch_size]])
        b = np.stack([s["image"] for s in vb[k:k + batch_size]])
        if np.array_equal(a, b):
            # augmentation-free pipeline (e.g. --synthetic): identical views
            # give zero variance-of-covariance and a degenerate mask — make
            # the second view an explicit photometric jitter instead
            scale = rng.uniform(0.8, 1.2,
                                (b.shape[0], 1, 1, 1)).astype(np.float32)
            b = np.clip(b * scale + rng.normal(0.0, 4.0, b.shape), 0, 255)
        pairs.append((jnp.asarray(a, jnp.float32),
                      jnp.asarray(b, jnp.float32)))
    return pairs


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    from mrfp_tpu.utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    # axon preflight + advisory one-client lock, same policy as cli.train:
    # a wedged execute path delays the launch instead of hanging it, and a
    # concurrent probe/job never attaches while this run owns the device
    from mrfp_tpu.utils.tpu_health import (acquire_device_lock, tpu_platform,
                                           wait_until_healthy)
    if tpu_platform() and args.num_processes in (None, 1):
        wait_until_healthy()
        acquire_device_lock()

    # armed BEFORE first device contact — a client-init hang (tunnel
    # full-unavailable wedge) exits 75 after first_beat_timeout instead of
    # hanging until an outer subprocess timeout (see cli.train)
    from mrfp_tpu.utils.watchdog import watchdog_from_arg
    watchdog = watchdog_from_arg(args.step_timeout, args.first_beat_timeout)

    from mrfp_tpu.parallel.dist import initialize_distributed
    multiproc = initialize_distributed(args.coordinator_address,
                                       args.num_processes, args.process_id)

    cfg = build_config(args)

    from mrfp_tpu.cli.train import build_dataset
    from mrfp_tpu.core.mesh import create_mesh, shard_state
    from mrfp_tpu.data.loader import DataLoader
    from mrfp_tpu.models.deepv3_zoo import DeepV3Plus, build_cov_layers
    from mrfp_tpu.train import create_train_state
    from mrfp_tpu.train.checkpoint import CheckpointManager
    from mrfp_tpu.train.evaluator import SegEvaluator
    from mrfp_tpu.train.loop import run_training_loop
    from mrfp_tpu.train.zoo_step import covstat_pass, make_zoo_jitted_step
    from mrfp_tpu.utils import prep_experiment

    exp = prep_experiment(cfg, root=args.runs_dir, rank=jax.process_index())
    logging.info("zoo experiment %s (%d processes, %d devices)", exp["name"],
                 jax.process_count(), jax.device_count())

    nproc = jax.process_count()
    if cfg.data.batch_size % nproc:
        raise ValueError(f"--batch-size {cfg.data.batch_size} not divisible "
                         f"by {nproc} processes")
    local_bs = cfg.data.batch_size // nproc
    dataset = build_dataset(args, cfg, train=True)
    loader = DataLoader(dataset, batch_size=local_bs, shuffle=True,
                        num_workers=cfg.data.num_workers, seed=args.seed,
                        shard_rank=jax.process_index(), shard_count=nproc)

    mesh = create_mesh(cfg.mesh) if (jax.device_count() > 1 or multiproc) \
        else None
    dtype = jnp.bfloat16 if args.bf16 else None
    model = DeepV3Plus(num_classes=cfg.model.num_classes,
                       trunk=cfg.model.trunk, variant=cfg.model.variant,
                       wt_layer=cfg.model.wt_layer, use_dsn=args.use_dsn,
                       dtype=dtype)
    state = create_train_state(model, cfg.train, (1, 64, 64, 3))

    # ISW/IRW statistics phase (deepv3.py:478-545): masks are host-side
    # constants baked into the jitted step. They derive from the *initial*
    # params; a resumed run recomputes them from the restored params below,
    # mirroring RobustNet's per-epoch mask refresh.
    wt_masks = wt_nrc = None
    needs_masks = cfg.model.use_wtloss and any(
        c in (1, 2) for c in cfg.model.wt_layer)

    ckpt = CheckpointManager(exp["ckpt_dir"], keep=cfg.train.keep_checkpoints)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        logging.info("resumed from step %d", int(state.step))
    if needs_masks:
        cov_layers = build_cov_layers(cfg.model.trunk, cfg.model.wt_layer,
                                      relax_denom=cfg.model.relax_denom,
                                      clusters=cfg.model.clusters)
        pairs = build_view_pairs(dataset, args.covstat_batches, local_bs,
                                 args.seed)
        wt_masks, wt_nrc = covstat_pass(model, state.params,
                                        state.batch_stats, cov_layers, pairs)
        logging.info("covstat phase: %d masks from %d view pairs",
                     len(wt_masks), len(pairs))
    if mesh is not None:
        state = shard_state(mesh, state)

    jtrain = make_zoo_jitted_step(model, cfg, mesh, wt_masks=wt_masks,
                                  wt_nrc=wt_nrc, aux_weight=args.aux_weight)
    writer = exp["writer"]

    val_dataset = build_dataset(args, cfg, train=False) \
        if args.eval_every else None
    evaluator = SegEvaluator(model, None, None,
                             num_classes=cfg.model.num_classes) \
        if args.eval_every else None

    def run_validation(state, step):
        ev = evaluator
        ev.params, ev.batch_stats = state.params, state.batch_stats
        res = ev.run(val_dataset, max_images=args.eval_max_images,
                     log=lambda *a, **k: None,
                     shard_rank=jax.process_index(),
                     shard_count=jax.process_count(),
                     heartbeat=watchdog.beat if watchdog else None)
        logging.info("iter %d val mean_iu %.5f acc %.5f", step,
                     res["mean_iu"], res["acc"])
        writer.add_scalar("val/mean_iu", res["mean_iu"], step)
        writer.add_scalar("val/acc", res["acc"], step)
        return {"mean_iu": res["mean_iu"], "acc": res["acc"]}

    _, step, preempted = run_training_loop(
        state, loader, jtrain, cfg, ckpt, writer, mesh=mesh,
        eval_every=args.eval_every, run_validation=run_validation,
        watchdog=watchdog, snapshot_every=args.snapshot_every)
    if preempted and step < cfg.train.max_iter:
        # resumable-but-incomplete must NOT look like success (cli.train
        # has the same policy): 75 tells cli.supervise to relaunch
        logging.warning("preempted at step %d/%d (resumable); exit 75",
                        step, cfg.train.max_iter)
        return 75
    return 0


if __name__ == "__main__":
    sys.exit(main())
