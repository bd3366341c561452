"""Input-pipeline throughput benchmark (no accelerator needed).

    python -m mrfp_tpu.cli.bench_input [--images 64] [--batch-size 16]

Builds a synthetic on-disk GTAV-layout tree at the real source resolution
(1914x1052 RGB PNGs + label PNGs, the decode load the reference trainer
reads), then measures DataLoader throughput through the FULL train pipeline
(decode -> flip/jitter -> scale+crop 768^2 -> blur -> collate) in thread and
process worker modes. The train step consumes ~45 img/s/chip (bench.py), so
the loader must sustain >= 1.2x that to keep the chip fed.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

import numpy as np


def build_tree(root: str, n: int, hw=(1052, 1914), seed: int = 0) -> None:
    from PIL import Image
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images/train"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels/train"), exist_ok=True)
    h, w = hw
    # a handful of distinct images re-saved under many names keeps build
    # time low while decode cost per read stays real
    uniq = []
    for i in range(min(n, 8)):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        lbl = rng.integers(0, 35, (h, w), dtype=np.uint8)
        uniq.append((img, lbl))
    for i in range(n):
        img, lbl = uniq[i % len(uniq)]
        Image.fromarray(img).save(
            os.path.join(root, f"images/train/{i:05d}.png"))
        Image.fromarray(lbl).save(
            os.path.join(root, f"labels/train/{i:05d}.png"))


def measure(dataset, batch_size: int, num_workers: int, mode: str,
            epochs: int = 1) -> float:
    from mrfp_tpu.data.loader import DataLoader
    dl = DataLoader(dataset, batch_size=batch_size, shuffle=True,
                    num_workers=num_workers, worker_mode=mode, seed=1)
    n_img = 0
    # warm one batch (thread spin-up / process pool fork)
    it = iter(dl)
    next(it)
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in dl:
            n_img += batch["image"].shape[0]
    dt = time.perf_counter() - t0
    dl.close()
    return n_img / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--root", default=None,
                   help="existing tree (default: build a temp one)")
    p.add_argument("--keep", action="store_true")
    args = p.parse_args()

    from mrfp_tpu.data.datasets import GTAV

    root = args.root or tempfile.mkdtemp(prefix="mrfp_loader_bench_")
    try:
        if args.root is None:
            t0 = time.perf_counter()
            build_tree(root, args.images)
            print(f"built {args.images}-image tree in "
                  f"{time.perf_counter() - t0:.1f}s at {root}")
        ds = GTAV(root=root, split="train", train=True,
                  base_size=768, crop_size=768)
        results = {}
        for mode in ("thread", "process"):
            ips = measure(ds, args.batch_size, args.num_workers, mode)
            results[mode] = round(ips, 1)
            print(f"{mode:8s}: {ips:6.1f} img/s "
                  f"({args.num_workers} workers, bs{args.batch_size})")
        print(json.dumps({"metric": "gtav_768_train_pipeline_img_per_sec",
                          "unit": "images/sec", **results}))
    finally:
        if args.root is None and not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
