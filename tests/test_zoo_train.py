"""End-to-end zoo training objective: ISW covstat phase -> masked wt loss ->
train steps with DSN aux, on the instrumented resnet-18 trunk."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrfp_tpu.core.config import Config
import dataclasses

from mrfp_tpu.models.deepv3_zoo import DeepV3Plus, build_cov_layers
from mrfp_tpu.train import create_train_state
from mrfp_tpu.train.zoo_step import covstat_pass, zoo_train_step


def test_isw_train_pipeline():
    wt = (0, 0, 0, 2, 2, 0, 0)
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, use_wtloss=True))
    model = DeepV3Plus(trunk="resnet-18", variant="D16", wt_layer=wt,
                       use_dsn=True)
    state = create_train_state(model, cfg.train, (1, 32, 32, 3))

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    cov_layers = build_cov_layers("resnet-18", wt, clusters=5)
    masks, nrc = covstat_pass(model, state.params, state.batch_stats,
                              cov_layers, [(mk(), mk()), (mk(), mk())])
    assert len(masks) == 2 and all(float(n) > 0 for n in nrc)

    images = mk()
    labels = jnp.asarray(rng.integers(0, 19, (2, 32, 32)), jnp.int32)
    step = jax.jit(functools.partial(zoo_train_step, model=model, cfg=cfg,
                                     wt_masks=masks, wt_nrc=nrc),
                   donate_argnums=0)
    for _ in range(2):
        state, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_wt"]) >= 0
    assert np.isfinite(float(metrics["loss_aux"]))
    assert int(state.step) == 2


@pytest.mark.slow
def test_zoo_isw_loop_learns_structure():
    """The full RobustNet-style objective (CE + DSN aux + ISW whitening loss)
    must learn *structure* on the color->class task, not just stay finite:
    covstat phase -> masked wt loss -> SGD steps -> eval-mode mIoU far above
    chance (~0.03) on held-out samples. This is the zoo counterpart of the
    MRFP+ e2e proof in test_e2e_learnable.py (train objective
    network/deepv3.py:547-600).

    Budget (measured 2026-08-17, cycling 8 distinct batches — a single
    fixed batch trains to loss<0.13 but collapses on held-out eval):
    150 steps -> held-out mIoU 0.587, 300 -> 0.604; floor 0.5."""
    from synthetic_task import _sample
    from mrfp_tpu.metrics import fast_hist

    wt = (0, 0, 0, 2, 2, 0, 0)
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, use_wtloss=True),
        train=dataclasses.replace(cfg.train, lr=2e-2, max_iter=200))
    model = DeepV3Plus(trunk="resnet-18", variant="D32", wt_layer=wt,
                       use_dsn=True)
    state = create_train_state(model, cfg.train, (1, 64, 64, 3))

    rng = np.random.default_rng(0)

    def batch(n):
        pairs = [_sample(rng, 64, 16) for _ in range(n)]
        imgs = jnp.asarray(np.stack([p[0] for p in pairs]), jnp.float32)
        lbls = jnp.asarray(np.stack([p[1] for p in pairs]), jnp.int32)
        return imgs, lbls

    cov_layers = build_cov_layers("resnet-18", wt, clusters=5)
    v1, _ = batch(2)
    v2, _ = batch(2)
    masks, nrc = covstat_pass(model, state.params, state.batch_stats,
                              cov_layers, [(v1, v2)])

    batches = [batch(8) for _ in range(8)]
    step = jax.jit(functools.partial(zoo_train_step, model=model, cfg=cfg,
                                     wt_masks=masks, wt_nrc=nrc),
                   donate_argnums=0)
    for i in range(150):
        images, labels = batches[i % 8]
        state, metrics = step(state, images, labels)
    assert float(metrics["loss_main"]) < 0.5, dict(
        (k, float(v)) for k, v in metrics.items())

    # held-out eval in inference mode (running BN stats, no dropout)
    val_imgs, val_lbls = batch(4)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      val_imgs, train=False, mutable=False)
    pred = np.asarray(jnp.argmax(out["logits"], -1))
    hist = fast_hist(pred.ravel(), np.asarray(val_lbls).ravel(), 19)
    iu = np.diag(hist) / np.maximum(
        hist.sum(0) + hist.sum(1) - np.diag(hist), 1)
    miou = float(np.nanmean(iu))
    assert miou >= 0.5, (miou, float(metrics["loss_main"]))
