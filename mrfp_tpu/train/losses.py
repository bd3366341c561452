"""Losses.

Cross-entropy with ignore_index matching torch nn.CrossEntropyLoss
(main.py:822: ignore_index=255, mean reduction over non-ignored pixels), and
the ISW/IRW instance-whitening loss (network/instance_whitening.py:19-27).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int = 255) -> jnp.ndarray:
    """Mean CE over valid pixels. logits (..., C) fp32, labels (...) int.

    Matches torch CrossEntropyLoss(ignore_index=...) with 'mean' reduction:
    sum of per-pixel NLL over valid pixels / number of valid pixels.
    """
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_index
    logits_f = logits.astype(jnp.float32)
    # NLL as logsumexp - selected logit; the selection is a one-hot masked
    # sum, NOT take_along_axis — a per-pixel gather lowers to a serialized
    # TPU gather that costs more than the whole backbone forward (profiled
    # at 72 ms/step for 8x768x768)
    lse = jax.nn.logsumexp(logits_f, axis=-1)
    classes = jnp.arange(logits.shape[-1], dtype=jnp.int32)
    true_logit = jnp.sum(
        jnp.where(labels[..., None] == classes, logits_f, 0.0), axis=-1)
    nll = jnp.where(valid, lse - true_logit, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def instance_whitening_loss(w_arr: Sequence[jnp.ndarray],
                            mask_matrices: Optional[Sequence[jnp.ndarray]],
                            margin=0.0,
                            num_remove_cov: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """ISW/IRW covariance penalty over collected whitening maps.

    For each collected NHWC map w: per-sample covariance
    f_cor = (f @ f^T)/(HW-1) + eps*I (instance_whitening.py:30-39), mask the
    selected off-diagonal entries, clamp((sum|.| - margin)/num_remove, 0),
    mean over batch; summed over maps.

    ``margin`` may be a scalar or a per-map sequence — with relax_denom > 0
    each ISW/IRW layer carries its own margin (the reference passes each
    layer's margin separately, network/deepv3.py:561-568).
    """
    total = jnp.asarray(0.0, jnp.float32)
    for i, w in enumerate(w_arr):
        n, h, wd, c = w.shape
        f = w.astype(jnp.float32).reshape(n, h * wd, c)
        cov = jnp.einsum("npc,npd->ncd", f, f) / (h * wd - 1)
        cov = cov + 1e-5 * jnp.eye(c, dtype=jnp.float32)
        if mask_matrices is not None:
            mask = mask_matrices[i]
        else:
            mask = jnp.triu(jnp.ones((c, c), jnp.float32), k=1)
        nrc = (num_remove_cov[i] if num_remove_cov is not None
               else jnp.sum(mask))
        m = margin[i] if isinstance(margin, (list, tuple)) else margin
        off = jnp.sum(jnp.abs(cov * mask), axis=(1, 2)) - m
        total = total + jnp.mean(jnp.clip(off / nrc, min=0.0))
    return total
