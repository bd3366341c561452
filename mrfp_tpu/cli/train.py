"""Training entry point — the working equivalent of main_script.sh + the
commented-out train loop in main.py:844-871.

    python -m mrfp_tpu.cli.train --source gtav --data-root /data \
        --max-iter 40000 --batch-size 16 [--synthetic]

Differences from the reference driver, by design:
- resumable: auto-restores the latest Orbax checkpoint (the reference can
  only restart manually from *_latest.pth),
- the input pipeline overlaps with device steps (prefetch_to_device),
- one flag (--synthetic) runs the full loop with generated data for smoke
  testing on machines without the datasets.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="mrfp_tpu trainer")
    p.add_argument("--source", default="gtav",
                   help="training domain (gtav|synthia|cityscapes|synthetic)")
    p.add_argument("--data-root", default="/data")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated data (no datasets needed)")
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    p.add_argument("--mode", default="mrfp+",
                   choices=["mrfp+", "mrfp", "baseline"])
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--crop-size", type=int, default=768)
    p.add_argument("--max-iter", type=int, default=40000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--runs-dir", default="./runs")
    return p.parse_args()


def build_config(args):
    from mrfp_tpu.core.config import (baseline_config, mrfp_config,
                                      mrfp_plus_config)
    cfg = {"mrfp+": mrfp_plus_config, "mrfp": mrfp_config,
           "baseline": baseline_config}[args.mode]()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, trunk=args.trunk,
                                  variant=args.variant),
        data=dataclasses.replace(cfg.data, source=args.source,
                                 batch_size=args.batch_size,
                                 crop_size=args.crop_size,
                                 base_size=args.crop_size),
        train=dataclasses.replace(cfg.train, max_iter=args.max_iter,
                                  lr=args.lr, seed=args.seed,
                                  checkpoint_every=args.ckpt_every,
                                  log_every=args.log_every),
    )
    return cfg


def main():
    args = parse_args()
    cfg = build_config(args)

    from mrfp_tpu.core.mesh import create_mesh
    from mrfp_tpu.data.datasets import DATASETS, TRAIN_SPLITS, SyntheticDataset
    from mrfp_tpu.data.loader import DataLoader, prefetch_to_device
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps
    from mrfp_tpu.train.checkpoint import CheckpointManager
    from mrfp_tpu.utils import AverageMeter, prep_experiment

    exp = prep_experiment(cfg, root=args.runs_dir)
    logging.info("experiment %s", exp["name"])

    if args.synthetic or args.source == "synthetic":
        dataset = SyntheticDataset(length=args.batch_size * 8,
                                   hw=(args.crop_size, args.crop_size))
    else:
        from mrfp_tpu.data.datasets import ConcatDataset
        # '+'-joined sources concatenate (main.py:821 GTAV+SYNTHIA)
        parts = []
        for src in args.source.split("+"):
            ds_cls = DATASETS[src]
            parts.append(ds_cls(root=args.data_root, split=TRAIN_SPLITS[src],
                                train=True, base_size=cfg.data.base_size,
                                crop_size=cfg.data.crop_size, seed=args.seed))
        dataset = parts[0] if len(parts) == 1 else ConcatDataset(parts)
    loader = DataLoader(dataset, batch_size=cfg.data.batch_size, shuffle=True,
                        num_workers=cfg.data.num_workers, seed=args.seed)

    mesh = create_mesh() if jax.device_count() > 1 else None
    dtype = jnp.bfloat16 if args.bf16 else None
    model = MRFP(num_classes=cfg.model.num_classes, trunk=cfg.model.trunk,
                 variant=cfg.model.variant, wt_layer=cfg.model.wt_layer,
                 hrfp_plus=cfg.model.hrfp_plus, dtype=dtype)
    oc = oc_init(jax.random.PRNGKey(args.seed + 1)) if cfg.perturb.enabled \
        else None
    state = create_train_state(model, cfg.train, (1, 64, 64, 3), oc_params=oc)
    if mesh is not None:
        state = jax.device_put(state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))

    ckpt = CheckpointManager(exp["ckpt_dir"],
                             keep=cfg.train.keep_checkpoints)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        logging.info("resumed from step %d", int(state.step))

    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    writer = exp["writer"]
    loss_meter = AverageMeter()
    t_last = time.perf_counter()

    step = int(state.step)
    while step < cfg.train.max_iter:
        for batch in prefetch_to_device(iter(loader), mesh):
            state, metrics = jtrain(state, batch["image"].astype(jnp.float32),
                                    batch["label"])
            step += 1
            if step % cfg.train.log_every == 0:
                loss = float(metrics["loss"])  # sync point
                loss_meter.update(loss)
                dt = (time.perf_counter() - t_last) / cfg.train.log_every
                t_last = time.perf_counter()
                ips = cfg.data.batch_size / dt
                logging.info("iter %d loss %.4f  %.1f img/s", step, loss, ips)
                writer.add_scalar("train/loss", loss, step)
                writer.add_scalar("train/images_per_sec", ips, step)
            if step % cfg.train.checkpoint_every == 0 or \
                    step >= cfg.train.max_iter - 20:
                ckpt.save(state)
            if step >= cfg.train.max_iter:
                break
    ckpt.save(state)
    ckpt.wait()
    logging.info("done at step %d", step)


if __name__ == "__main__":
    main()
