"""End-to-end zoo training objective: ISW covstat phase -> masked wt loss ->
train steps with DSN aux, on the instrumented resnet-18 trunk."""

import functools

import numpy as np
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
