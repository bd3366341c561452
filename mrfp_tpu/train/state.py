"""Train state and optimizer.

Optimizer matches main.py:826,832-839: SGD(lr=1e-2, momentum=0.9,
weight_decay=5e-4 coupled) with poly decay (1 - iter/max_iter)^0.9. The OC
branch params are state, not optimizer targets (requires_grad_(False) in the
reference, deepv3.py:221-237).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mrfp_tpu.core.config import TrainConfig
from mrfp_tpu.perturb.oc_branch import OCParams


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    oc_params: Optional[OCParams]
    opt_state: Any
    base_key: jax.Array


def lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Poly decay: lr * (1 - step/max_iter)^power (main.py:832-839)."""
    return optax.polynomial_schedule(
        init_value=cfg.lr, end_value=0.0, power=cfg.poly_power,
        transition_steps=cfg.max_iter)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """torch-coupled SGD: grad += wd*param, then momentum buffer, then lr.

    ``momentum_dtype='bfloat16'`` stores the momentum buffer in bf16 (halves
    its HBM traffic; a byte lever on the bandwidth-bound step — parity tests
    keep the default f32, which matches torch bitwise).
    """
    acc_dtype = (jnp.bfloat16 if cfg.momentum_dtype == "bfloat16" else None)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False,
                    accumulator_dtype=acc_dtype),
        optax.scale_by_learning_rate(lr_schedule(cfg)),
    )


def create_train_state(model, cfg: TrainConfig, input_shape,
                       oc_params: Optional[OCParams] = None,
                       seed: Optional[int] = None) -> TrainState:
    """Initialize params/stats on host and wrap into a TrainState."""
    seed = cfg.seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    k_init, k_base = jax.random.split(key)
    # jit the init: eager per-op dispatch is ~10x slower on some backends
    init_fn = jax.jit(lambda k, x: model.init({"params": k}, x, train=False))
    variables = init_fn(k_init, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        oc_params=oc_params,
        opt_state=tx.init(params),
        base_key=k_base,
    )
