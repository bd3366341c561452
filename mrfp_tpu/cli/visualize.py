"""Qualitative prediction dumps: image / colorized prediction / colorized GT
triplets as PNGs (the decode_segmap usage of utils_main.py:28-63).

    python -m mrfp_tpu.cli.visualize --ckpt ref.pth --data-root /data \
        --domain cityscapes --out ./viz --n 8
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--data-root", default="/data")
    p.add_argument("--domain", default="cityscapes")
    p.add_argument("--out", default="./viz")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-hw", type=int, nargs=2, default=(256, 512),
                   help="H W of the synthetic images")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32")
    args = p.parse_args()

    from mrfp_tpu.cli.eval import load_model_and_params
    from mrfp_tpu.data.datasets import DATASETS, VAL_SPLITS, SyntheticDataset
    from mrfp_tpu.data.label_maps import decode_segmap

    model, params, stats = load_model_and_params(args)
    if args.synthetic:
        ds = SyntheticDataset(length=args.n, hw=tuple(args.synthetic_hw))
    else:
        from mrfp_tpu.data.datasets import domain_root
        ds = DATASETS[args.domain](root=domain_root(args.data_root,
                                                    args.domain),
                                   split=VAL_SPLITS[args.domain], train=False)

    @jax.jit
    def predict(variables, image):
        out = model.apply(variables, image, train=False, mutable=False)
        return jnp.argmax(out["logits"], axis=-1)

    os.makedirs(args.out, exist_ok=True)
    variables = {"params": params, "batch_stats": stats}
    for i in range(min(args.n, len(ds))):
        sample = ds[i]
        img = np.asarray(sample["image"], np.float32)
        lbl = np.asarray(sample["label"], np.int32)
        pred = np.asarray(predict(variables, jnp.asarray(img)[None]))[0]
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(args.out, f"{i:03d}_image.png"))
        Image.fromarray(decode_segmap(pred.astype(np.uint8))).save(
            os.path.join(args.out, f"{i:03d}_pred.png"))
        Image.fromarray(decode_segmap(lbl.astype(np.uint8))).save(
            os.path.join(args.out, f"{i:03d}_gt.png"))
    print(f"wrote {min(args.n, len(ds)) * 3} PNGs to {args.out}")


if __name__ == "__main__":
    main()
