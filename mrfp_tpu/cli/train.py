"""Training entry point — the working equivalent of main_script.sh + the
commented-out train loop in main.py:844-871.

    python -m mrfp_tpu.cli.train --source gtav --data-root /data \
        --max-iter 40000 --batch-size 16 [--synthetic]

Differences from the reference driver, by design:
- resumable: auto-restores the latest Orbax checkpoint (the reference can
  only restart manually from *_latest.pth),
- the input pipeline overlaps with device steps (prefetch_to_device),
- one flag (--synthetic) runs the full loop with generated data for smoke
  testing on machines without the datasets,
- mid-training validation (--eval-every) rotates a best-by-mIoU checkpoint
  like the RobustNet harness (utils/misc.py:139-257),
- multi-host: jax.distributed bootstrap + per-process batch shards replace
  the reference's NCCL rendezvous (main.py:42-52) and DistributedSampler.
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
    p = argparse.ArgumentParser(description="mrfp_tpu trainer")
    p.add_argument("--source", default="gtav",
                   help="training domain (gtav|synthia|cityscapes|synthetic; "
                        "'+'-join to concatenate)")
    p.add_argument("--data-root", default="/data")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated data (no datasets needed)")
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    p.add_argument("--mode", default="mrfp+",
                   choices=["mrfp+", "mrfp", "baseline"])
    p.add_argument("--batch-size", type=int, default=16,
                   help="GLOBAL batch size (split across processes)")
    p.add_argument("--crop-size", type=int, default=768)
    p.add_argument("--max-iter", type=int, default=40000)
    p.add_argument("--accum-steps", type=int, default=1,
                   help="split each step's batch into N sequential "
                        "microbatches inside one jit (activations stay "
                        "microbatch-sized; effective batches beyond one "
                        "chip's HBM)")
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--oc-conditional", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="compute the OC halves under lax.cond (fastest on "
                        "TPU). --no-oc-conditional selects the reference-"
                        "style always-compute form — same math, and a "
                        "workaround when the AOT compile of the cond-gated "
                        "step crashes (observed on some libtpu/compile-"
                        "helper rolls at small crop sizes)")
    p.add_argument("--use-dsn", action="store_true",
                   help="auxiliary DSN head on layer3 (0.4-weighted CE)")
    p.add_argument("--freq-transform", default=None,
                   choices=[None, "hpf", "lpf", "phot"],
                   help="in-graph FFT batch transform (dataloaders.py:24-79)")
    p.add_argument("--random-flip", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--color-jitter", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-color-jitter disables the b/c/s/h jitter "
                        "(main.py:413) — e.g. for tasks where absolute color "
                        "carries the label")
    p.add_argument("--gaussian-blur", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--scale-range", type=float, nargs=2, default=(0.5, 2.0),
                   metavar=("MIN", "MAX"))
    p.add_argument("--class-uniform-pct", type=float, default=0.0,
                   help="fraction of train crops biased toward rare-class "
                        "centroids (reference CLASS_UNIFORM_PCT, config.py:53)")
    p.add_argument("--batch-weighting", action="store_true",
                   help="per-batch rare-class CE upweighting (reference "
                        "BATCH_WEIGHTING, config.py:56)")
    p.add_argument("--jointwtborder", action="store_true",
                   help="border-relaxed CE (reference config.py:121): any "
                        "class within a (2*border+1)^2 window is acceptable "
                        "near label borders; target built on device "
                        "(train/losses.relaxed_cross_entropy)")
    p.add_argument("--border-window", type=int, default=1,
                   help="relaxation half-window (reference BORDER_WINDOW)")
    p.add_argument("--reduce-border-iter", type=int, default=-1,
                   help="after this iteration the window halves and "
                        "boundary pixels weight 2 (reference "
                        "REDUCE_BORDER_ITER); -1 = never")
    p.add_argument("--strict-border-class", type=int, nargs="*", default=None,
                   help="class ids that keep exact one-hot targets "
                        "(reference STRICT_BORDER_CLASS)")
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--eval-every", type=int, default=0,
                   help="run validation every N iters; 0 = off. Feeds the "
                        "best-by-mIoU checkpoint rotation")
    p.add_argument("--eval-max-images", type=int, default=None)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--step-timeout", type=float, default=None,
                   help="exit 75 (restartable; training auto-resumes) when "
                        "no step syncs for this many seconds — failure "
                        "detection for wedged device execution. Default: "
                        "1800 on TPU, off elsewhere; 0 disables")
    p.add_argument("--first-beat-timeout", type=float, default=None,
                   help="window for the FIRST step sync (covers program "
                        "compilation). Default: max(2x step-timeout, 3600). "
                        "Supervised relaunches with a warm persistent "
                        "compile cache can pass a tight one so pre-step "
                        "wedges cost minutes, not the fresh-compile budget")
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="every N steps, fetch the train state to host and "
                        "let the watchdog checkpoint it if the device "
                        "wedges — auto-resume then loses at most N steps "
                        "instead of a full --ckpt-every interval. Costs a "
                        "state-sized device fetch per N steps. 0 = off; "
                        "needs --step-timeout and a single-process run")
    p.add_argument("--runs-dir", default="./runs")
    # distributed / mesh (reference main.py:42-52 WORLD_SIZE bootstrap)
    p.add_argument("--coordinator-address", default=None,
                   help="host:port of process 0 (auto-detected on TPU pods)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--data-parallel", type=int, default=-1,
                   help="mesh data axis size (-1 = all devices)")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--spatial-parallel", type=int, default=1,
                   help="shard image H over this many chips (GSPMD conv "
                        "halo exchange) — for resolutions whose activations "
                        "exceed one chip's HBM")
    return p.parse_args()


def build_config(args):
    from mrfp_tpu.core.config import (MeshConfig, baseline_config,
                                      mrfp_config, mrfp_plus_config)
    cfg = {"mrfp+": mrfp_plus_config, "mrfp": mrfp_config,
           "baseline": baseline_config}[args.mode]()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, trunk=args.trunk,
                                  variant=args.variant,
                                  use_dsn_aux=args.use_dsn),
        data=dataclasses.replace(cfg.data, source=args.source,
                                 batch_size=args.batch_size,
                                 crop_size=args.crop_size,
                                 base_size=args.crop_size,
                                 freq_transform=args.freq_transform,
                                 random_flip=args.random_flip,
                                 color_jitter=(cfg.data.color_jitter
                                               if args.color_jitter else None),
                                 gaussian_blur=args.gaussian_blur,
                                 scale_range=tuple(args.scale_range),
                                 class_uniform_pct=args.class_uniform_pct,
                                 batch_weighting=args.batch_weighting,
                                 jointwtborder=args.jointwtborder,
                                 border_window=args.border_window,
                                 reduce_border_iter=args.reduce_border_iter,
                                 strict_border_class=(
                                     tuple(args.strict_border_class)
                                     if args.strict_border_class else None)),
        train=dataclasses.replace(cfg.train, max_iter=args.max_iter,
                                  lr=args.lr, seed=args.seed,
                                  accum_steps=args.accum_steps,
                                  checkpoint_every=args.ckpt_every,
                                  log_every=args.log_every),
        mesh=MeshConfig(data_parallel=args.data_parallel,
                        model_parallel=args.model_parallel,
                        spatial_parallel=args.spatial_parallel),
    )
    return cfg


def build_dataset(args, cfg, train: bool = True):
    from mrfp_tpu.data.datasets import (DATASETS, TRAIN_SPLITS, VAL_SPLITS,
                                        ConcatDataset, SyntheticDataset,
                                        domain_root)
    # '+'-joined sources concatenate (main.py:821 GTAV+SYNTHIA)

    if args.synthetic or args.source == "synthetic":
        if train:
            return SyntheticDataset(length=args.batch_size * 8,
                                    hw=(args.crop_size, args.crop_size))
        return SyntheticDataset(length=4, hw=(args.crop_size, args.crop_size),
                                seed=7)
    parts = []
    for src in args.source.split("+"):
        ds_cls = DATASETS[src]
        splits = TRAIN_SPLITS if train else VAL_SPLITS
        parts.append(ds_cls(
            root=domain_root(args.data_root, src), split=splits[src],
            train=train,
            base_size=cfg.data.base_size, crop_size=cfg.data.crop_size,
            seed=args.seed,
            random_flip=cfg.data.random_flip,
            color_jitter=cfg.data.color_jitter,
            scale_range=cfg.data.scale_range,
            gaussian_blur=cfg.data.gaussian_blur,
            class_uniform_pct=cfg.data.class_uniform_pct,
            class_uniform_classes=cfg.data.class_uniform_classes))
        if not train:
            return parts[0]  # validate on the first source's val split
    return parts[0] if len(parts) == 1 else ConcatDataset(parts)


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    from mrfp_tpu.utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    # axon preflight: bounded wait for a healthy execute path + advisory
    # single-client lock (no-op off-TPU; MRFP_TPU_PREFLIGHT=0 skips).
    # Single-process runs only: cluster processes coordinate through the
    # distributed runtime, and same-host ranks must not wait on each other.
    from mrfp_tpu.utils.tpu_health import (acquire_device_lock, tpu_platform,
                                           wait_until_healthy)
    if tpu_platform() and args.num_processes in (None, 1):
        wait_until_healthy()
        acquire_device_lock()

    # Arm the watchdog BEFORE the first device contact: in the tunnel's
    # full-unavailable wedge mode even client init (jax.devices) hangs
    # forever at 0% CPU (CLAUDE.md 2026-08-19/21) — armed here, that hang
    # costs first_beat_timeout instead of an outer subprocess timeout.
    # Env-based policy only; safe pre-jax.
    from mrfp_tpu.utils.watchdog import watchdog_from_arg
    watchdog = watchdog_from_arg(args.step_timeout, args.first_beat_timeout)

    # multi-host bootstrap BEFORE any device query (main.py:42-52 equivalent)
    from mrfp_tpu.parallel.dist import initialize_distributed
    multiproc = initialize_distributed(args.coordinator_address,
                                       args.num_processes, args.process_id)

    cfg = build_config(args)

    from mrfp_tpu.core.mesh import create_mesh, shard_state
    from mrfp_tpu.data.loader import DataLoader
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps
    from mrfp_tpu.train.checkpoint import CheckpointManager
    from mrfp_tpu.train.evaluator import SegEvaluator
    from mrfp_tpu.utils import prep_experiment

    exp = prep_experiment(cfg, root=args.runs_dir, rank=jax.process_index())
    logging.info("experiment %s (%d processes, %d devices)", exp["name"],
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
    model = MRFP(num_classes=cfg.model.num_classes, trunk=cfg.model.trunk,
                 variant=cfg.model.variant, wt_layer=cfg.model.wt_layer,
                 hrfp_plus=cfg.model.hrfp_plus, use_dsn=cfg.model.use_dsn_aux,
                 oc_conditional=args.oc_conditional, dtype=dtype)
    oc = oc_init(jax.random.PRNGKey(args.seed + 1)) if cfg.perturb.enabled \
        else None
    state = create_train_state(model, cfg.train, (1, 64, 64, 3), oc_params=oc)
    if mesh is not None:
        state = shard_state(mesh, state)

    ckpt = CheckpointManager(exp["ckpt_dir"],
                             keep=cfg.train.keep_checkpoints)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        logging.info("resumed from step %d", int(state.step))

    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    writer = exp["writer"]

    val_dataset = build_dataset(args, cfg, train=False) \
        if args.eval_every else None

    # ONE evaluator for all mid-training validations: params flow into its
    # jitted hist step as arguments, so refreshing the attributes per call
    # reuses the compiled program (a fresh SegEvaluator per validation would
    # re-trace — and pay the ~5-min axon first-compile — every --eval-every)
    evaluator = SegEvaluator(model, None, None,
                             num_classes=cfg.model.num_classes) \
        if args.eval_every else None

    def run_validation(state, step):
        ev = evaluator
        ev.params, ev.batch_stats = state.params, state.batch_stats
        # every process scores a disjoint stride of the val set; partial
        # histograms merge via all-gather so all ranks see the same mIoU.
        # heartbeat: a mixed-shape validation can legitimately take many
        # minutes (one tunnel compile per distinct shape) — beat per synced
        # image so the watchdog only fires on a genuinely wedged device
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

    from mrfp_tpu.train.loop import run_training_loop
    _, step, preempted = run_training_loop(
        state, loader, jtrain, cfg, ckpt, writer, mesh=mesh,
        eval_every=args.eval_every, run_validation=run_validation,
        watchdog=watchdog, snapshot_every=args.snapshot_every)
    if preempted and step < cfg.train.max_iter:
        # resumable-but-incomplete must NOT look like success: exit 75
        # (EX_TEMPFAIL) so cli.supervise / any restart policy relaunches
        # and Orbax auto-resume continues from the checkpoint just saved
        logging.warning("preempted at step %d/%d (resumable); exit 75",
                        step, cfg.train.max_iter)
        return 75
    return 0


if __name__ == "__main__":
    sys.exit(main())
