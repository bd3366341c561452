"""Preflight launch planner: compile the sharded train step for a given
launch configuration — without data, a checkpoint, or the chips themselves —
and report what every step will actually cost on the pod.

The reference offers no way to know what DDP + SyncBatchNorm +
SyncSwitchWhiten will put on the wire short of running the job and watching
NCCL (main.py:42-52, network/__init__.py:30-38, sync_switchwhiten.py:22-45).
Under GSPMD the compiled HLO *is* the contract, so a launch can be audited
ahead of time: this tool builds the exact train step `cli.train` would run
(same config factories, same mesh, same sharding rules), compiles it against
a simulated device slice (forced-CPU host devices by default, so it runs on
a laptop or a 1-chip sandbox; ``--live`` plans against the real platform),
and prints

  - the mesh and the per-chip shard of params / optimizer momentum / BN
    stats (what tensor parallelism buys),
  - every collective GSPMD inserted, rolled up by op with byte counts (what
    data/spatial/tensor parallelism pays per step: grad+stat all-reduces,
    conv-halo permutes, channel regathers),
  - compiled FLOPs and HBM bytes per step (roofline inputs),

plus one machine-readable JSON line (``--json-out`` writes it to a file).

Collective-profile ground truth for the audited program lives in
tests/test_collective_audit.py; this CLI exposes the same audit for any
launch configuration a user is about to pay for.
"""

from __future__ import annotations

import argparse
import json
import dataclasses
import os
import subprocess
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="preflight plan: compile the sharded train step and "
                    "report per-step collectives, per-chip memory, and "
                    "roofline inputs for a launch configuration")
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    p.add_argument("--mode", default="mrfp+",
                   choices=["mrfp+", "mrfp", "baseline"])
    p.add_argument("--batch-size", type=int, default=16,
                   help="GLOBAL batch size")
    p.add_argument("--crop-size", type=int, default=768)
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--data-parallel", type=int, default=-1,
                   help="-1 fills the remaining devices (needs "
                        "--devices or --live)")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--spatial-parallel", type=int, default=1)
    p.add_argument("--devices", type=int, default=None,
                   help="total devices in the planned slice (default: "
                        "dp*mp*sp when dp is explicit)")
    p.add_argument("--live", action="store_true",
                   help="plan against the live jax platform instead of a "
                        "forced-CPU simulated slice")
    p.add_argument("--json-out", default=None)
    p.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    return p.parse_args(argv)


def _n_devices(args) -> int:
    if args.devices is not None:
        return args.devices
    if args.data_parallel > 0:
        return (args.data_parallel * args.model_parallel
                * args.spatial_parallel)
    raise SystemExit("--data-parallel is -1 (fill): pass --devices N "
                     "(total slice size) or an explicit --data-parallel")


def main(argv=None):
    args = parse_args(argv)
    n = _n_devices(args)
    if args.live or args._child:
        return _run_plan(args, n)

    # Re-exec against a forced n-device CPU platform (never touches the
    # live backend — a planning tool must work when the chips are busy or
    # absent; same isolation recipe as parallel/dryrun.py).
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    xla_flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (
        f"{xla_flags} --xla_force_host_platform_device_count={n}").strip()
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo_root + (os.pathsep + pp if pp else "")
    cmd = [sys.executable, "-m", "mrfp_tpu.cli.plan", "--_child"]
    cmd += (argv if argv is not None else sys.argv[1:])
    proc = subprocess.run(cmd, env=env)
    raise SystemExit(proc.returncode)


def _bytes_per_chip(tree, shardings, mesh) -> int:
    """Per-chip bytes of a (possibly channel-sharded) state subtree."""
    import jax
    import numpy as np

    total = 0
    for x, sh in zip(jax.tree_util.tree_leaves(tree),
                     jax.tree_util.tree_leaves(
                         shardings, is_leaf=lambda s: hasattr(s, "spec"))):
        b = int(np.prod(np.shape(x))) * np.dtype(x.dtype).itemsize
        frac = 1
        for ax in sh.spec:
            if ax is not None:
                frac *= mesh.shape[ax]
        total += b // frac
    return total


def _run_plan(args, n: int):
    import jax
    import numpy as np

    from mrfp_tpu.core.config import (MeshConfig, baseline_config,
                                      mrfp_config, mrfp_plus_config)
    from mrfp_tpu.core.mesh import (batch_sharding, create_mesh,
                                    state_shardings)
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.parallel.audit import parse_collectives, summarize
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps

    devices = jax.devices()
    if len(devices) < n:
        raise SystemExit(f"platform has {len(devices)} devices, plan needs "
                         f"{n} (drop --live to simulate the slice on CPU)")

    cfg = {"mrfp+": mrfp_plus_config, "mrfp": mrfp_config,
           "baseline": baseline_config}[args.mode]()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, trunk=args.trunk,
                                  variant=args.variant),
        data=dataclasses.replace(cfg.data, batch_size=args.batch_size,
                                 crop_size=args.crop_size),
        train=dataclasses.replace(cfg.train, accum_steps=args.accum_steps),
        mesh=MeshConfig(data_parallel=args.data_parallel,
                        model_parallel=args.model_parallel,
                        spatial_parallel=args.spatial_parallel),
    )
    mesh = create_mesh(cfg.mesh, devices[:n])

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.bf16 else None
    model = MRFP(num_classes=cfg.model.num_classes, trunk=cfg.model.trunk,
                 variant=cfg.model.variant, wt_layer=cfg.model.wt_layer,
                 hrfp_plus=cfg.model.hrfp_plus, use_dsn=cfg.model.use_dsn_aux,
                 dtype=dtype)
    oc = oc_init(jax.random.PRNGKey(1)) if cfg.perturb.enabled else None
    state = create_train_state(model, cfg.train, (1, 64, 64, 3), oc_params=oc)
    shardings = state_shardings(mesh, state)

    # abstract batch: the planner never allocates the global batch
    hw = args.crop_size
    imgs = jax.ShapeDtypeStruct((args.batch_size, hw, hw, 3), np.float32,
                                sharding=batch_sharding(mesh, 4))
    lbls = jax.ShapeDtypeStruct((args.batch_size, hw, hw), np.int32,
                                sharding=batch_sharding(mesh, 3))
    abstract_state = jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype, sharding=s),
        state, shardings)

    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    compiled = jtrain.lower(abstract_state, imgs, lbls).compile()

    colls = summarize(parse_collectives(compiled.as_text()))

    # roofline inputs (per step, whole slice)
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", float("nan")))
    hbm = float(cost.get("bytes accessed", float("nan")))

    param_b = _bytes_per_chip(state.params, shardings.params, mesh)
    mom_b = _bytes_per_chip(state.opt_state, shardings.opt_state, mesh)
    stat_b = _bytes_per_chip(state.batch_stats, shardings.batch_stats, mesh)
    grad_full = sum(int(np.prod(np.shape(x))) * 4
                    for x in jax.tree_util.tree_leaves(state.params))

    report = {
        "mesh": {ax: int(mesh.shape[ax]) for ax in mesh.axis_names},
        "devices": n,
        "platform": jax.default_backend(),
        "global_batch": args.batch_size,
        "crop": hw,
        "accum_steps": args.accum_steps,
        "per_chip_bytes": {"params": param_b, "momentum": mom_b,
                           "batch_stats": stat_b},
        "fp32_grad_set_bytes": grad_full,
        "collectives_per_step": {k: {"count": int(v["count"]),
                                     "mbytes": round(v["bytes"] / 1e6, 2)}
                                 for k, v in sorted(colls.items())},
        "flops_per_step": flops,
        "hbm_bytes_per_step": hbm,
    }

    mb = lambda b: f"{b / 1e6:,.1f} MB"
    print(f"mesh {report['mesh']} over {n} {report['platform']} devices; "
          f"global batch {args.batch_size} @ {hw}x{hw}"
          + (f", {args.accum_steps} microbatches" if args.accum_steps > 1
             else ""))
    print(f"per-chip state: params {mb(param_b)}, momentum {mb(mom_b)}, "
          f"BN stats {mb(stat_b)}")
    if not colls:
        print("collectives/step: none (single-device program)")
    for op, v in sorted(colls.items()):
        hint = {"all-reduce": "grad + norm-stat sync",
                "collective-permute": "conv halo exchange / reshard",
                "all-gather": "activation regather (SP/TP tax)",
                "all-to-all": "layout reshard",
                "reduce-scatter": "sharded grad reduce"}.get(op, "")
        print(f"collectives/step: {op:19s} x{int(v['count']):<4d} "
              f"{mb(v['bytes']):>12s}  {hint}")
    ar = colls.get("all-reduce", {"bytes": 0})
    if ar["bytes"]:
        print(f"grad-sync check: all-reduce total {mb(ar['bytes'])} vs fp32 "
              f"grad set {mb(grad_full)}")
    if flops == flops:  # not NaN
        print(f"compiled/step: {flops / 1e12:.2f} TFLOP, "
              f"{hbm / 1e9:.2f} GB HBM touched "
              f"(arithmetic intensity {flops / max(hbm, 1):.0f} flop/byte)")
    line = json.dumps(report)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
