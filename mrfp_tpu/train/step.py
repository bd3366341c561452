"""The pjit'd train / eval steps.

One compiled program per (shape, config): gates are traced booleans so every
perturbation combination shares the compilation (the reference re-randomizes
weights host-side and relies on eager execution, deepv3.py:281-306). Gradient
sync, SyncBN moments, and NP+'s cross-batch std all come from GSPMD: the
batch is sharded over the mesh 'data' axis and every batch reduction lowers
to an ICI all-reduce.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mrfp_tpu.core.config import Config
from mrfp_tpu.core.rng import step_keys
from mrfp_tpu.models.mrfp import PerturbArgs
from mrfp_tpu.perturb.oc_branch import oc_maybe_resample
from mrfp_tpu.train.losses import batch_class_weights, cross_entropy
from mrfp_tpu.train.state import TrainState, make_optimizer


def train_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray,
               *, model, cfg: Config) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step. images NHWC float32 or uint8, labels NHW int32 or uint8.

    Pure function of (state, batch): the per-step RNG is folded from
    state.base_key and state.step (core/rng.py), so the run is bitwise
    reproducible and restartable from a checkpointed step.
    """
    # uint8 wire format (data/transforms.ToArray): integer batches cross
    # host->device at 4x fewer bytes and are cast here, on device —
    # uint8 -> f32 is exact, so the step is bit-identical to a f32 wire
    images = images.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    keys = step_keys(state.base_key, state.step)
    pc = cfg.perturb

    if cfg.data.freq_transform:
        # in-graph HPF/LPF/PHOT on the batch (dataloaders.py:24-79 done
        # device-side; XLA FFT instead of a host numpy pass)
        from mrfp_tpu.perturb.fft_style import apply_freq_transform
        images = apply_freq_transform(images, cfg.data.freq_transform)

    perturb = None
    oc_params = state.oc_params
    if pc.enabled and oc_params is not None:
        u = jax.random.uniform(keys["gates"], (3,))
        gate_oc = u[0] < pc.p_oc
        gate_np = u[1] < pc.p_np
        gate_dec = u[2] < pc.p_dec
        # re-randomize OC weights when the stem gate fires (deepv3.py:290-306)
        oc_params = oc_maybe_resample(oc_params, gate_oc, keys["oc_resample"],
                                      pc.oc_bn_std)
        perturb = PerturbArgs(gate_oc=gate_oc, gate_np=gate_np, gate_dec=gate_dec,
                              key_np0=keys["np_l0"], key_np1=keys["np_l1"],
                              oc_params=oc_params)

    # BATCH_WEIGHTING (config.py:56; dead in the reference's live path):
    # per-batch rare-class upweighting of the CE. A function of the labels
    # only — no gradient flows through the weights. Computed from the FULL
    # batch (not per microbatch) so accum_steps>1 trains the same objective
    # the reference's single pass over the batch would.
    cw = (batch_class_weights(labels, cfg.model.num_classes,
                              cfg.data.ignore_index)
          if cfg.data.batch_weighting else None)

    def forward_loss(params, batch_stats, imgs, lbls, ptb, dropout_key):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, train=True, perturb=ptb, mutable=["batch_stats"],
            rngs={"dropout": dropout_key})
        if cfg.data.jointwtborder:
            # border-relaxed CE (config.py:121): multi-hot target built on
            # device; after reduce_border_iter the window halves and
            # boundary pixels weight 2 — a traced bool, so the whole
            # schedule is one compiled program
            from mrfp_tpu.train.losses import relaxed_cross_entropy
            reduce_now = (cfg.data.reduce_border_iter != -1) & \
                (state.step > cfg.data.reduce_border_iter)
            loss = relaxed_cross_entropy(
                out["logits"], lbls, cfg.model.num_classes,
                cfg.data.ignore_index, cfg.data.border_window, reduce_now,
                cfg.data.strict_border_class)
        else:
            loss = cross_entropy(out["logits"], lbls, cfg.data.ignore_index,
                                 class_weights=cw)
        if "dsn" in out:
            # DSN aux head: CE against nearest-downsampled labels, weight 0.4
            # (network/deepv3.py:570-577; zoo_step uses the same recipe)
            from mrfp_tpu.ops.resize import resize_nearest
            aux = out["dsn"]
            lbl4 = lbls[..., None].astype(jnp.float32)
            lbl_s = resize_nearest(lbl4, size=(aux.shape[1], aux.shape[2]))
            loss = loss + 0.4 * cross_entropy(
                aux, lbl_s[..., 0].astype(jnp.int32), cfg.data.ignore_index)
        return loss, (mutated["batch_stats"], out)

    accum = max(1, cfg.train.accum_steps)
    if accum == 1:
        (loss, (new_stats, _out)), grads = jax.value_and_grad(
            forward_loss, has_aux=True)(
                state.params, state.batch_stats, images, labels, perturb,
                keys["dropout"])
    else:
        # Gradient accumulation: N sequential microbatches inside the step.
        # mb-major split — image i goes to microbatch i % accum — so each
        # device scans over ITS OWN batch shard and nothing crosses the mesh
        # (a contiguous split would reshard every scan iteration). Gates and
        # OC weights are per optimizer step (reference re-randomizes per
        # iteration, deepv3.py:290-306); NP+/dropout keys fold in the
        # microbatch index so noise stays independent across microbatches.
        if images.shape[0] % accum:
            raise ValueError(f"batch {images.shape[0]} not divisible by "
                             f"accum_steps {accum}")
        mb = images.shape[0] // accum
        xs_img = jnp.moveaxis(
            images.reshape(mb, accum, *images.shape[1:]), 1, 0)
        xs_lbl = jnp.moveaxis(
            labels.reshape(mb, accum, *labels.shape[1:]), 1, 0)
        grad_fn = jax.value_and_grad(forward_loss, has_aux=True)

        def body(carry, xs):
            stats, gsum, lsum = carry
            im, lb, i = xs
            ptb = perturb
            if ptb is not None:
                ptb = ptb.replace(
                    key_np0=jax.random.fold_in(perturb.key_np0, i),
                    key_np1=jax.random.fold_in(perturb.key_np1, i))
            (l, (stats, _)), g = grad_fn(
                state.params, stats, im, lb, ptb,
                jax.random.fold_in(keys["dropout"], i))
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            return (stats, gsum, lsum + l), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_stats, gsum, lsum), _ = jax.lax.scan(
            body, (state.batch_stats, zeros, jnp.zeros((), jnp.float32)),
            (xs_img, xs_lbl, jnp.arange(accum)))
        # mean of microbatch means — the DDP gradient-average semantics
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        loss = lsum / accum

    tx = make_optimizer(cfg.train)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        oc_params=oc_params,
        opt_state=new_opt_state,
    )
    metrics = {"loss": loss}
    return new_state, metrics


def eval_step(params, batch_stats, images, *, model) -> jnp.ndarray:
    """Eval forward returning per-pixel argmax predictions (N,H,W) int32."""
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      images.astype(jnp.float32), train=False, mutable=False)
    return jnp.argmax(out["logits"], axis=-1).astype(jnp.int32)


def _state_sharding_constraint(mesh: Mesh):
    """in/out sharding entry for the train-state argument.

    Pure DP/SP mesh: force full replication (the parity configuration).
    Mesh with a >1 'model' axis (tensor parallelism): leave it UNSPECIFIED —
    the caller commits the state with core.mesh.shard_state (channel tensors
    sharded over 'model'), jit adopts those shardings, and GSPMD propagates
    them through the step so params/momentum/BN stats stay sharded in place
    (donation keeps the update in-buffer)."""
    from mrfp_tpu.core.mesh import _model_axis
    if _model_axis(mesh) is not None:
        return None
    return NamedSharding(mesh, P())


def mesh_jit_train(fn, mesh: Optional[Mesh]):
    """jit a ``(state, images, labels) -> (state, metrics)`` step under mesh
    shardings: replicated (DP/SP) or caller-committed tensor-sharded (TP)
    state, batch over 'data' (+ image H over 'spatial' when the mesh has
    one), pallas-free multi-device trace, donated state. ``mesh=None`` is a
    plain donating jit. Shared by the MRFP and zoo steps."""
    if mesh is None:
        return jax.jit(fn, donate_argnums=0)
    if mesh.size > 1:
        from mrfp_tpu.ops.resize import pallas_kernels_disabled
        inner = fn

        @functools.wraps(inner)
        def fn(*args, **kwargs):
            with pallas_kernels_disabled():
                return inner(*args, **kwargs)

    from mrfp_tpu.core.mesh import batch_sharding
    repl = NamedSharding(mesh, P())
    st = _state_sharding_constraint(mesh)
    return jax.jit(fn,
                   in_shardings=(st, batch_sharding(mesh, 4),
                                 batch_sharding(mesh, 3)),
                   out_shardings=(st, repl), donate_argnums=0)


def make_jitted_steps(model, cfg: Config, mesh: Optional[Mesh] = None):
    """Build jitted train/eval steps with mesh shardings.

    State is replicated on a DP/SP mesh; on a mesh with a >1 'model' axis
    the caller commits it tensor-sharded via core.mesh.shard_state and jit
    adopts those shardings (_state_sharding_constraint). The batch is
    sharded over 'data'. State buffers are donated so params update in
    place (no HBM spike).
    """
    t = functools.partial(train_step, model=model, cfg=cfg)
    e = functools.partial(eval_step, model=model)

    if cfg.train.fuse_bn_stats:
        # trace-time opt-in: bottleneck 1x1+BN pairs emit their BN sums from
        # the conv's own VMEM pass (ops/pallas_dot_stats.py). Single-device
        # TPU only — the multi-device branch below disables Pallas anyway.
        from mrfp_tpu.ops.pallas_dot_stats import bn_stats_fusion

        def _with_fusion(f):
            @functools.wraps(f)
            def g(*args, **kwargs):
                with bn_stats_fusion(True):
                    return f(*args, **kwargs)
            return g

        t = _with_fusion(t)

    # the train jit (shardings, pallas-free multi-device trace, donation)
    # is the same policy the zoo step uses — one implementation
    jt = mesh_jit_train(t, mesh)

    if mesh is None:
        return jt, jax.jit(e)

    if mesh.size > 1:
        # GSPMD cannot partition pallas_call: route resizes through the
        # einsum forms (shardable dots) while tracing the sharded program
        from mrfp_tpu.ops.resize import pallas_kernels_disabled

        def _no_pallas(f):
            @functools.wraps(f)
            def g(*args, **kwargs):
                with pallas_kernels_disabled():
                    return f(*args, **kwargs)
            return g

        e = _no_pallas(e)

    from mrfp_tpu.core.mesh import batch_sharding
    # batch over 'data'; image H additionally over 'spatial' when the mesh
    # has one (GSPMD conv halo exchange — core/mesh.py docstring)
    data4 = batch_sharding(mesh, 4)
    data3 = batch_sharding(mesh, 3)
    st = _state_sharding_constraint(mesh)
    je = jax.jit(e, in_shardings=(st, st, data4), out_shardings=data3)
    return jt, je
