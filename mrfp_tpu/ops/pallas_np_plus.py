"""Pallas TPU kernel: fused NP+ application.

Applies ``alpha*x + (beta-alpha)*mean`` (deepv3.py:276) in a single
read-modify-write over HBM with the (B,C) coefficient vectors resident in
VMEM. The statistics (spatial means, cross-batch std, alpha/beta draws) stay
in jnp.

MEASURED (v5e, 8x192x192x64): 2.34 ms vs 1.10 ms for the jnp version — XLA
already fuses the elementwise apply into one pass, so the hand-written
kernel's pipeline setup only adds overhead. The production path
(perturb.np_plus) therefore stays on jnp; this kernel is kept as a verified
Pallas reference (it matches bitwise) and a template for ops XLA does NOT
fuse (see ops/pallas_hist.py for the one that wins 4.9x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_kernel(x_ref, a_ref, b_ref, out_ref):
    # block: (1, BH, W, C); coefficients (1, 1, 1, C) slices of this batch row
    a = a_ref[:]
    b = b_ref[:]
    out_ref[:] = x_ref[:] * a + b


def np_plus_apply_pallas(x: jnp.ndarray, alpha: jnp.ndarray,
                         shift: jnp.ndarray,
                         block_h: int = 32,
                         interpret: bool = False) -> jnp.ndarray:
    """out = x*alpha + shift with NHWC x and (B,1,1,C) coefficients."""
    n, h, w, c = x.shape
    bh = min(block_h, h)
    pad_h = (-h) % bh
    if pad_h:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
    grid = (n, (h + pad_h) // bh)
    out = pl.pallas_call(
        _apply_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, alpha.astype(x.dtype), shift.astype(x.dtype))
    return out[:, :h] if pad_h else out


def normalization_perturbation_plus_pallas(key: jax.Array, feat: jnp.ndarray,
                                           std: float = 0.75,
                                           scale_mult: float = 1.5,
                                           block_h: int = 32,
                                           interpret: bool = False) -> jnp.ndarray:
    """NP+ with the Pallas fused apply. Math identical to
    perturb.np_plus.normalization_perturbation_plus:
      out = alpha*feat + (beta-alpha)*feat_mean
    """
    f32 = feat.astype(jnp.float32)
    feat_mean = jnp.mean(f32, axis=(1, 2), keepdims=True)          # (B,1,1,C)
    mean_diff = jnp.std(feat_mean, axis=0, keepdims=True, ddof=1)
    mean_scale = mean_diff / jnp.max(mean_diff) * scale_mult
    k1, k2 = jax.random.split(key)
    shape = feat_mean.shape
    alpha = 1.0 + std * jax.random.normal(k1, shape, jnp.float32)
    beta = 1.0 + std * jax.random.normal(k2, shape, jnp.float32) * mean_scale
    shift = (beta - alpha) * feat_mean
    return np_plus_apply_pallas(feat, alpha, shift, block_h=block_h,
                                interpret=interpret)


def np_plus_auto(key, feat, std: float = 0.75, scale_mult: float = 1.5):
    """The fastest measured NP+ implementation: the jnp version (XLA fuses
    the apply into one pass; the Pallas kernel measured 2.1x slower)."""
    from mrfp_tpu.perturb.np_plus import normalization_perturbation_plus
    return normalization_perturbation_plus(key, feat, std, scale_mult)
