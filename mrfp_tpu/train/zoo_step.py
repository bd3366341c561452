"""Train step for the DeepV3Plus zoo model (network/deepv3.py:548-585):

  total = CE(main) + aux_weight * CE(dsn, nearest-downsampled gts)
          [+ wt_reg_weight * whitening loss over collected maps]

plus the two-phase ISW workflow: ``covstat_pass`` accumulates the variance of
covariance over pairs of augmented views (deepv3.py:478-545), then masks are
frozen host-side and passed into the train step as arrays.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mrfp_tpu.core.config import Config
from mrfp_tpu.ops.resize import resize_nearest
from mrfp_tpu.train.losses import cross_entropy, instance_whitening_loss
from mrfp_tpu.train.state import TrainState, make_optimizer


def zoo_train_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray,
                   *, model, cfg: Config,
                   wt_masks: Optional[Sequence[jnp.ndarray]] = None,
                   wt_nrc: Optional[Sequence[float]] = None,
                   aux_weight: float = 0.4,
                   dropout_seed: int = 17):
    """One step of the zoo training objective."""
    # uint8 wire format: cast on device (see train/step.py)
    images = images.astype(jnp.float32)
    labels = labels.astype(jnp.int32)

    def loss_fn(params):
        rngs = {"dropout": jax.random.fold_in(
            jax.random.PRNGKey(dropout_seed), state.step)}
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"], rngs=rngs)
        loss = cross_entropy(out["logits"], labels, cfg.data.ignore_index)
        metrics = {"loss_main": loss}
        if "dsn" in out:
            # aux label: nearest-downsample gts to the dsn resolution
            # (network/deepv3.py:570-576)
            aux = out["dsn"]
            lbl4 = labels[..., None].astype(jnp.float32)
            lbl_s = resize_nearest(lbl4, size=(aux.shape[1], aux.shape[2]))
            aux_loss = cross_entropy(aux, lbl_s[..., 0].astype(jnp.int32),
                                     cfg.data.ignore_index)
            loss = loss + aux_weight * aux_loss
            metrics["loss_aux"] = aux_loss
        if cfg.model.use_wtloss and out.get("w_arr"):
            wl = instance_whitening_loss(out["w_arr"], wt_masks, 0.0, wt_nrc)
            wl = wl / max(len(out["w_arr"]), 1)
            loss = loss + cfg.model.wt_reg_weight * wl
            metrics["loss_wt"] = wl
        metrics["loss"] = loss
        return loss, (mutated["batch_stats"], metrics)

    (loss, (new_stats, metrics)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    tx = make_optimizer(cfg.train)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
    return state.replace(step=state.step + 1, params=new_params,
                         batch_stats=new_stats, opt_state=new_opt), metrics


def make_zoo_jitted_step(model, cfg: Config, mesh=None,
                         wt_masks: Optional[Sequence[jnp.ndarray]] = None,
                         wt_nrc: Optional[Sequence[float]] = None,
                         aux_weight: float = 0.4):
    """Mesh-jitted zoo step: replicated state, batch over 'data' (+ H over
    'spatial'), GSPMD grad/SyncBN reductions — the DDP+SyncBatchNorm setup
    every RobustNet config trains under (reference config.py:92-93), for the
    zoo objective. ``mesh=None`` is a plain donating jit."""
    from mrfp_tpu.train.step import mesh_jit_train

    fn = functools.partial(zoo_train_step, model=model, cfg=cfg,
                           wt_masks=wt_masks, wt_nrc=wt_nrc,
                           aux_weight=aux_weight)
    return mesh_jit_train(fn, mesh)


def covstat_pass(model, params, batch_stats, cov_layers,
                 view_pairs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]]):
    """ISW statistics phase: run concatenated augmented view pairs through
    the backbone and accumulate variance-of-covariance (deepv3.py:478-545),
    then freeze the masks. Returns (wt_masks, wt_nrc) ready for
    zoo_train_step."""
    from mrfp_tpu.models.deepv3_zoo import covstat_update

    fwd = jax.jit(functools.partial(
        model.apply, train=False, mutable=False, cal_covstat=True))
    for a, b in view_pairs:
        # uint8 wire format: cast on device (see train/step.py)
        x = jnp.concatenate([a, b], axis=0).astype(jnp.float32)
        out = fwd({"params": params, "batch_stats": batch_stats}, x)
        covstat_update(cov_layers, out["w_arr"])
    masks, nrc = [], []
    for layer in cov_layers:
        layer.set_mask_matrix() if hasattr(layer, "set_mask_matrix") else None
        _eye, mask, _margin, n = layer.get_mask_matrix()
        masks.append(jnp.asarray(mask))
        nrc.append(float(n))
    return masks, nrc
