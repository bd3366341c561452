"""Headline benchmark: MRFP+ (DeepLabV3+ ResNet-50 D16) train throughput.

Measures 768x768 training images/sec/chip with the full perturbation path
(OC resample + NP+ + gated decoder injection), bf16 compute / fp32 params,
on whatever accelerator JAX finds (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput (SURVEY.md §6); BASELINE.md
sets the target ">=2x PyTorch-A100 images/sec/chip". We use an estimated
PyTorch-1.12/A100 throughput for this exact model/recipe (bs16 768^2 fp32
DeepLabV3+ R50-D16 + OC branch ~= 18 img/s) as the denominator, so
vs_baseline >= 2.0 means the target is met.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_PYTORCH_IMG_PER_SEC = 18.0  # estimated reference throughput (see docstring)

# Spec HBM bandwidth (v5e: 819 GB/s). The roofline denominator must be the
# SPEC rate, not the 360 GB/s single-stream copy-probe rate (CLAUDE.md
# round-2): XLA's fused conv pipelines overlap many streams and demonstrably
# exceed the copy-probe number (a 360-based floor yields util > 1 — measured
# 2026-08-21). Util vs spec is the conservative, estimate-independent claim.
SPEC_HBM_BYTES_PER_S = 819e9


def roofline_utilization(jtrain, args, step_time_s: float):
    """Estimate-independent headline: measured step time as a fraction of
    the spec-HBM roofline for this exact compiled program — bytes accessed
    per step (XLA cost model) over the chip's spec bandwidth. 1.0 = the
    step runs exactly at the memory-bound floor; the A100 estimate plays
    no part."""
    try:
        cost = jtrain.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        bytes_per_step = float(cost["bytes accessed"])
    except Exception:
        return None, None
    floor_s = bytes_per_step / SPEC_HBM_BYTES_PER_S
    return bytes_per_step, floor_s / step_time_s


def main():
    # preflight BEFORE creating the in-process jax client: the axon execute
    # path can wedge (hangs forever, unrecoverable in-process — CLAUDE.md);
    # a bounded subprocess probe turns that into a delay instead of a hang,
    # and the advisory lock keeps us off the device while another run owns
    # it (one axon client at a time).
    from mrfp_tpu.utils.tpu_health import (acquire_device_lock,
                                           wait_until_healthy)
    wait_until_healthy()
    # persistent compilation cache: the ~5 min first-compile of the 768^2
    # train step is paid once per machine, not per bench run (MRFP_JAX_CACHE
    # overrides the location; empty disables)
    from mrfp_tpu.utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    # rbg PRNG: ~2.5% faster step (the in-graph OC re-init draws 3.7M
    # normals); still fully deterministic per (key, step)
    jax.config.update("jax_default_prng_impl", "rbg")

    from mrfp_tpu.core.config import Config
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps

    # if the execute path wedges AFTER the preflight, warmup would hang
    # forever; the watchdog turns that into exit 75 for the caller to retry
    # (no beat needed before the first loss fetch — the first-beat window
    # covers a fresh tunnel compile)
    from mrfp_tpu.utils.watchdog import watchdog_from_arg
    watchdog = watchdog_from_arg(None)

    cfg = Config()
    acquire_device_lock()
    n_chips = jax.device_count()
    batch = 8 * n_chips          # per-chip batch 8 fits one v5e chip
    hw = cfg.data.crop_size      # 768

    model = MRFP(trunk="resnet-50", variant="D16", dtype=jnp.bfloat16)
    # init at a tiny spatial size: parameter/stat shapes are size-independent
    state = create_train_state(model, cfg.train, (1, 64, 64, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, hw, hw, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 19, (batch, hw, hw)), jnp.int32)

    if n_chips > 1:
        from mrfp_tpu.core.mesh import create_mesh, shard_batch
        mesh = create_mesh()
        state = jax.device_put(state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        images, labels = shard_batch(mesh, (images, labels))
        jtrain, _ = make_jitted_steps(model, cfg, mesh)
    else:
        jtrain, _ = make_jitted_steps(model, cfg, None)

    # warmup / compile (covers both OC-resample branches). NOTE: timing is
    # closed by fetching the final loss scalar — on the axon tunnel backend
    # block_until_ready does not synchronize.
    for _ in range(3):
        state, metrics = jtrain(state, images, labels)
    _ = float(metrics["loss"])
    if watchdog is not None:
        watchdog.beat()

    iters = 40
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = jtrain(state, images, labels)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    if watchdog is not None:
        watchdog.stop()

    img_per_sec_per_chip = batch * iters / dt / n_chips
    bytes_per_step, util = roofline_utilization(
        jtrain, (state, images, labels), dt / iters)
    out = {
        "metric": "mrfp_plus_r50_768_train_images_per_sec_per_chip",
        "value": round(img_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_per_chip / A100_PYTORCH_IMG_PER_SEC, 3),
    }
    if util is not None:
        # fraction of the spec-bandwidth HBM floor achieved (see
        # roofline_utilization) — stands without the A100 estimate
        out["roofline_util"] = round(util, 3)
        out["bytes_per_step_gb"] = round(bytes_per_step / 1e9, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
