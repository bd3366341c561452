"""Multi-domain evaluation entry point (main.py:876-913).

    python -m mrfp_tpu.cli.eval --ckpt runs/.../ckpt --data-root /data \
        --domains bdd100k cityscapes synthia mapillary gtav

Accepts either an Orbax run directory or a PyTorch .pth checkpoint from the
reference (imported on the fly through train.import_torch).
"""

from __future__ import annotations

import argparse
import json
import logging

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description="mrfp_tpu multi-domain eval")
    p.add_argument("--ckpt", required=False, default=None,
                   help="Orbax run dir or reference .pth file")
    p.add_argument("--data-root", default="/data")
    p.add_argument("--domains", nargs="+",
                   default=["bdd100k", "cityscapes", "synthia",
                            "mapillary", "gtav"],
                   help="domain names, or 'all' for the 5-domain "
                        "reference sweep")
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    p.add_argument("--arch", default=None,
                   help="evaluate a zoo (cli.train_zoo) checkpoint instead "
                        "of MRFP: a reference factory name "
                        "(network/deepv3.py:606-779), e.g. DeepR50V3PlusD")
    p.add_argument("--wt-layer", type=int, nargs=7, default=None, metavar="W",
                   help="whitening plan of the zoo checkpoint (must match "
                        "training; changes the parameter structure)")
    p.add_argument("--use-dsn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="zoo checkpoints carry the DSN aux head by default")
    p.add_argument("--eval-size", type=int, default=1536)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-hw", type=int, nargs=2, default=(256, 512),
                   metavar=("H", "W"),
                   help="synthetic image size (smoke tests)")
    p.add_argument("--strict-pairs", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="drop images whose label size mismatches "
                        "(reference behavior, main.py:894); "
                        "--no-strict-pairs crops to the common extent")
    p.add_argument("--json-out", default=None,
                   help="also write the results dict to this file")
    p.add_argument("--bucket", type=int, default=None,
                   help="pad eval shapes up to multiples of N (fewer "
                        "compiles for mixed-shape domains; logits deviate "
                        "near padded borders). Default: exact shapes, the "
                        "reference protocol")
    p.add_argument("--eval-batch", type=int, default=1,
                   help="group N same-shape images per forward (exact by "
                        "construction: eval-mode BN has no cross-image "
                        "coupling and the final partial group is padded "
                        "with all-ignore dummies, so one compile per "
                        "shape; bit-identical on CPU fp32 — on TPU bf16 "
                        "near-tie argmaxes may differ between batch sizes, "
                        "use 1 for parity numbers). Wins on single-shape "
                        "domains; exact-shape protocol only (ignored with "
                        "--bucket)")
    p.add_argument("--spatial-parallel", type=int, default=1,
                   help="shard each image's H over this many chips (GSPMD "
                        "conv halo exchange; batch-1 multi-chip serving). "
                        "1 = single-device eval (default)")
    p.add_argument("--step-timeout", type=float, default=None,
                   help="watchdog: exit 75 (restartable) when no image "
                        "batch syncs within this window — a wedged device "
                        "execution otherwise hangs the sweep forever. "
                        "Default: 1800 s on TPU, off elsewhere; 0 disables")
    p.add_argument("--corrupt", choices=["fog", "rain"], default=None,
                   help="apply a synthetic adverse-weather corruption to "
                        "every eval image (data/weather.py) — the "
                        "executable analog of the reference's pre-rendered "
                        "Foggy/Rainy Cityscapes protocol (main.py:146-341, "
                        "Table 2)")
    p.add_argument("--severity", type=int, default=2,
                   help="corruption severity 1..4 (with --corrupt); "
                        "roughly tracks the rendered datasets' beta/density "
                        "ladder")
    p.add_argument("--parity", action="store_true",
                   help="declare this run a reference-parity measurement: "
                        "refuses any protocol deviation (--bucket, "
                        "--eval-batch >1, --dtype bfloat16, "
                        "--no-strict-pairs). The reference protocol "
                        "(main.py:896) is exact shapes, one image per "
                        "forward, float32 wire — deviations are faster but "
                        "not bit-faithful (see --eval-batch/--bucket docs), "
                        "and must never silently contaminate a parity table")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="compute dtype. float32 (default) is the reference "
                        "parity protocol; bfloat16 is the fast serving path "
                        "(~2.2x forward throughput on TPU; logits stay f32, "
                        "borderline argmaxes can differ)")
    return p.parse_args()


def load_model_and_params(args):
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.train.import_torch import load_torch_checkpoint

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    # getattr: other CLIs (visualize) reuse this loader with a smaller
    # argparse surface — absent zoo args mean the MRFP path
    arch = getattr(args, "arch", None)
    wt_arg = getattr(args, "wt_layer", None)
    zoo = arch is not None or wt_arg is not None
    if zoo:
        from mrfp_tpu.models.deepv3_zoo import DeepV3Plus, get_net
        wt = tuple(wt_arg) if wt_arg else (0,) * 7
        use_dsn = getattr(args, "use_dsn", True)
        if arch:
            model = get_net(arch, wt_layer=wt, use_dsn=use_dsn, dtype=dtype)
        else:
            model = DeepV3Plus(trunk=args.trunk, variant=args.variant,
                               wt_layer=wt, use_dsn=use_dsn, dtype=dtype)
    else:
        model = MRFP(trunk=args.trunk, variant=args.variant, dtype=dtype)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    if args.ckpt and args.ckpt.endswith(".pth"):
        params, stats, _oc, report = load_torch_checkpoint(args.ckpt, variables)
        logging.info("imported torch checkpoint: %d tensors, %d skipped",
                     report["loaded"], len(report["skipped"]))
    elif args.ckpt:
        from mrfp_tpu.core.config import Config
        from mrfp_tpu.perturb import oc_init
        from mrfp_tpu.train import create_train_state
        from mrfp_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.ckpt)
        # MRFP+/MRFP runs carry OC params in the state; baseline runs store
        # None there — try the perturbed template first, fall back to the
        # baseline structure on mismatch
        state, errors = None, []
        templates = (None,) if zoo else (oc_init(jax.random.PRNGKey(1)), None)
        for oc in templates:
            template = create_train_state(model, Config().train,
                                          (1, 64, 64, 3), oc_params=oc)
            try:
                state = mgr.restore(template)
                break
            except Exception as e:  # structure mismatch, corruption, IO...
                errors.append(f"{'mrfp+' if oc else 'baseline'} template: "
                              f"{type(e).__name__}: {e}")
        if state is None:
            # surface every attempt: a corrupted/incompatible checkpoint
            # must not masquerade as a missing one
            raise FileNotFoundError(
                f"no restorable checkpoint under {args.ckpt}; attempts:\n"
                + "\n".join(errors) if errors else
                f"no checkpoint under {args.ckpt}")
        params, stats = state.params, state.batch_stats
    return model, params, stats


def check_parity_protocol(args):
    """--parity: fail fast on any flag that breaks the reference protocol
    (round-4 verdict: batched eval is not bitwise at TPU bf16 precision —
    docs alone cannot keep it out of a future real-data parity number)."""
    violations = []
    if args.bucket is not None:
        violations.append("--bucket (padded borders deviate ~0.04 mIoU)")
    if args.eval_batch != 1:
        violations.append("--eval-batch >1 (near-tie argmax flips on TPU)")
    if args.dtype != "float32":
        violations.append("--dtype bfloat16 (borderline argmaxes differ)")
    if not args.strict_pairs:
        violations.append("--no-strict-pairs (reference drops mismatches)")
    if args.corrupt:
        violations.append("--corrupt (synthetic weather is not the "
                          "reference's rendered-dataset protocol)")
    if violations:
        raise SystemExit("--parity refuses protocol deviations:\n  "
                         + "\n  ".join(violations))


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.parity:
        check_parity_protocol(args)
    from mrfp_tpu.utils import (enable_persistent_compile_cache,
                                enable_stack_dumps)
    enable_persistent_compile_cache()
    enable_stack_dumps()  # kill -USR1 <pid> -> all-thread Python stacks
    # axon preflight (no-op off-TPU): see utils/tpu_health.py
    from mrfp_tpu.utils.tpu_health import (acquire_device_lock, tpu_platform,
                                           wait_until_healthy)
    if tpu_platform():
        wait_until_healthy()
        acquire_device_lock()
    # armed BEFORE first device contact (load_model_and_params inits the
    # jax client): a client-init hang in the tunnel's full-unavailable
    # wedge mode exits 75 after the first-beat window instead of hanging
    # the sweep until an outer timeout (see cli.train). The evaluator
    # beats after every few synced images.
    from mrfp_tpu.utils.watchdog import watchdog_from_arg
    watchdog = watchdog_from_arg(args.step_timeout)
    model, params, stats = load_model_and_params(args)

    from mrfp_tpu.data.datasets import (DATASETS, VAL_SPLITS,
                                        SyntheticDataset, domain_root)
    from mrfp_tpu.train.evaluator import SegEvaluator

    mesh = None
    if args.spatial_parallel > 1:
        from mrfp_tpu.core.config import MeshConfig
        from mrfp_tpu.core.mesh import create_mesh
        mesh = create_mesh(MeshConfig(data_parallel=1,
                                      spatial_parallel=args.spatial_parallel))
    evaluator = SegEvaluator(model, params, stats,
                             strict_pairs=args.strict_pairs,
                             bucket=args.bucket, mesh=mesh,
                             eval_batch=args.eval_batch)
    if args.domains == ["all"]:
        args.domains = ["bdd100k", "cityscapes", "synthia", "mapillary",
                        "gtav"]
    results = {}
    for domain in args.domains:
        if args.synthetic:
            ds = SyntheticDataset(length=4, hw=tuple(args.synthetic_hw))
            ds.name = domain
        else:
            ds = DATASETS[domain](root=domain_root(args.data_root, domain),
                                  split=VAL_SPLITS[domain], train=False,
                                  eval_size=args.eval_size)
        if args.corrupt:
            from mrfp_tpu.data.weather import CorruptedDataset
            ds = CorruptedDataset(ds, args.corrupt, args.severity)
        res = evaluator.run(ds, max_images=args.max_images,
                            heartbeat=watchdog.beat if watchdog else None)
        print(f"Number of images dropped: {res['dropped']}")
        results[domain] = {"mean_iu": res["mean_iu"], "acc": res["acc"],
                           "fwavacc": res["fwavacc"]}
    if watchdog is not None:
        watchdog.stop()
    print(json.dumps(results, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
