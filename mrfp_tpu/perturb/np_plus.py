"""NP+ — Normalization Perturbation Plus (deepv3.py:268-277).

Channel-statistics style noise: each sample's per-channel spatial mean is
rescaled by random alpha ~ N(1, 0.75) and shifted toward beta whose magnitude
is modulated by how much the channel means spread *across the batch*
(``mean_diff = std over batch``). That batch statistic is a global-batch
reduction — under GSPMD with a sharded batch it syncs over the data axis for
free, matching the reference's single-process semantics at any device count.

A fused Pallas kernel for this op lives in ops/pallas_np_plus.py (single pass
over HBM: one read computing the mean, one read-modify-write applying the
affine); this jnp version is the reference implementation and the CPU/test
path. XLA already fuses the elementwise tail into neighbors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalization_perturbation_plus(key: jax.Array,
                                    feat: jnp.ndarray,
                                    std: float = 0.75,
                                    scale_mult: float = 1.5) -> jnp.ndarray:
    """Apply NP+ to NHWC ``feat``. Randomness: per (sample, channel).

    Exact port of the reference math:
      feat_mean  = mean over (H,W)                       (B,1,1,C)
      mean_diff  = std over batch of feat_mean (ddof=1)  (1,1,1,C)
      mean_scale = mean_diff / max(mean_diff) * 1.5
      alpha ~ N(1, 0.75);  beta = 1 + N(0, 0.75) * mean_scale
      out = alpha*feat - alpha*feat_mean + beta*feat_mean
    """
    f32 = feat.astype(jnp.float32)
    feat_mean = jnp.mean(f32, axis=(1, 2), keepdims=True)          # (B,1,1,C)
    mean_diff = jnp.std(feat_mean, axis=0, keepdims=True, ddof=1)  # (1,1,1,C)
    mean_scale = mean_diff / jnp.max(mean_diff) * scale_mult
    k1, k2 = jax.random.split(key)
    shape = feat_mean.shape
    alpha = 1.0 + std * jax.random.normal(k1, shape, jnp.float32)
    beta = 1.0 + std * jax.random.normal(k2, shape, jnp.float32) * mean_scale
    out = alpha * f32 - alpha * feat_mean + beta * feat_mean
    return out.astype(feat.dtype)
