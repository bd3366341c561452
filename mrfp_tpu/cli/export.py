"""Serving export entry point: checkpoint -> one self-contained ``.mrfpx``
artifact (StableHLO with the weights baked in; see mrfp_tpu/serving.py).

    python -m mrfp_tpu.cli.export --ckpt runs/.../ckpt --out model.mrfpx \
        --height 1024 --width 2048 [--batch 1] [--dtype bfloat16] \
        [--platforms tpu cpu] [--check]

Accepts the same checkpoint forms as cli.eval (Orbax run dir or reference
.pth). The exported computation is the pure eval forward — image batch in,
f32 logits out — at a FIXED shape (TPU serving wants static shapes; export
several sizes if the fleet serves several). ``--check`` round-trips the
artifact through deserialize and asserts it reproduces the live model's
logits on random inputs before the file is declared good.

The reference has no counterpart (its deployment is "ship the .pth and the
whole model zoo source", main.py:884-893); this is the TPU-native
equivalent of a torchscript/ONNX export.
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="mrfp_tpu serving export")
    p.add_argument("--ckpt", default=None,
                   help="Orbax run dir or reference .pth (default: "
                        "randomly initialized weights — smoke tests)")
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    p.add_argument("--arch", default=None,
                   help="export a zoo (cli.train_zoo) checkpoint instead of "
                        "MRFP: a reference factory name "
                        "(network/deepv3.py:606-779), e.g. DeepR50V3PlusD")
    p.add_argument("--wt-layer", type=int, nargs=7, default=None, metavar="W",
                   help="whitening plan of the zoo checkpoint (must match "
                        "training; selects the zoo model even without "
                        "--arch). Whitening layers run frozen eval-mode "
                        "statistics inside the artifact")
    p.add_argument("--use-dsn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="zoo checkpoints carry the DSN aux head by default "
                        "(only the main logits are exported)")
    p.add_argument("--out", required=True, help="output .mrfpx path")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16",
                   help="compute dtype inside the artifact; logits are "
                        "always f32 (bfloat16 is the TPU serving default, "
                        "float32 the parity protocol — cli.eval docs)")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms, e.g. 'tpu cpu' (default: the "
                        "current backend only)")
    p.add_argument("--wire", choices=["uint8", "float32"], default="uint8",
                   help="input dtype of the exported signature. uint8 "
                        "(default) casts to the compute dtype inside the "
                        "artifact — bit-identical logits at 4x fewer "
                        "ingress bytes (pixels are raw 0..255); float32 "
                        "for callers that feed preprocessed floats")
    p.add_argument("--check", action="store_true",
                   help="deserialize the written file and assert it matches "
                        "the live model on a random batch")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    from mrfp_tpu.cli.eval import load_model_and_params
    from mrfp_tpu.serving import load_exported, save_exported
    from mrfp_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    model, params, stats = load_model_and_params(args)

    variables = {"params": params, "batch_stats": stats}

    def forward(image):
        # uint8 wire: the cast to the compute path's f32 is exact, so the
        # artifact's logits are bit-identical to a float32-fed export
        out = model.apply(variables, image.astype(jnp.float32),
                          train=False, mutable=False)
        return out["logits"].astype(jnp.float32)

    from jax import export as jax_export

    wire_dtype = jnp.uint8 if args.wire == "uint8" else jnp.float32
    shape = (args.batch, args.height, args.width, 3)
    spec = jax.ShapeDtypeStruct(shape, wire_dtype)
    kwargs = {"platforms": args.platforms} if args.platforms else {}
    exported = jax_export.export(jax.jit(forward), **kwargs)(spec)

    model_id = {"trunk": args.trunk, "variant": args.variant}
    if args.arch or args.wt_layer:
        model_id["family"] = "deepv3_zoo"
        if args.arch:
            model_id["arch"] = args.arch
        model_id["wt_layer"] = list(args.wt_layer or (0,) * 7)
        model_id["use_dsn"] = args.use_dsn
    manifest = {
        "format": "mrfpx-v1",
        "model": model_id,
        "input": {"shape": list(shape), "dtype": args.wire,
                  "layout": "NHWC", "pixel_scale": "raw 0..255"},
        "output": {"shape": list(exported.out_avals[0].shape),
                   "dtype": "float32", "semantics": "per-class logits"},
        "compute_dtype": args.dtype,
        "platforms": list(exported.platforms),
        "ckpt": args.ckpt or "random-init",
    }
    save_exported(args.out, exported, manifest)
    # wire dtype is part of the artifact CONTRACT (the default changed to
    # uint8 in round 4, MIGRATING.md) — say it out loud, not just in the
    # manifest, so a re-export with unchanged flags can't silently change
    # what callers must feed
    logging.info("wrote %s (%s, wire=%s, platforms=%s)", args.out, shape,
                 args.wire, manifest["platforms"])

    if args.check:
        fn, mf = load_exported(args.out)
        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, shape).astype(np.uint8) \
            if args.wire == "uint8" \
            else rng.uniform(0, 255, shape).astype(np.float32)
        got = np.asarray(fn(x))
        want = np.asarray(jax.jit(forward)(x))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        logging.info("check ok: artifact reproduces the live forward "
                     "bit-for-bit on %s", mf["input"]["shape"])
    print(args.out)


if __name__ == "__main__":
    main()
