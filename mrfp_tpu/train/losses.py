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
                  ignore_index: int = 255,
                  class_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE over valid pixels. logits (..., C) fp32, labels (...) int.

    Matches torch CrossEntropyLoss(ignore_index=...) with 'mean' reduction:
    sum of per-pixel NLL over valid pixels / number of valid pixels. With
    ``class_weights`` (C,), matches torch's weighted mean: per-pixel NLL
    scaled by w[y] and normalized by sum of w[y] over valid pixels.
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
    onehot = labels[..., None] == classes
    true_logit = jnp.sum(jnp.where(onehot, logits_f, 0.0), axis=-1)
    nll = jnp.where(valid, lse - true_logit, 0.0)
    if class_weights is None:
        count = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(nll) / count
    w = jnp.sum(jnp.where(onehot, class_weights.astype(jnp.float32), 0.0),
                axis=-1)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def batch_class_weights(labels: jnp.ndarray, num_classes: int,
                        ignore_index: int = 255,
                        upper_bound: float = 1.0) -> jnp.ndarray:
    """Per-batch class weights for BATCH_WEIGHTING (reference config.py:56).

    The knob is dead in the reference's live path; the semantics are the
    RobustNet harness it was inherited from (ImageBasedCrossEntropyLoss2d.
    calculate_weights): normalized class histogram ``hist`` over the batch,
    ``w = (hist != 0) * upper_bound * (1 - hist) + 1`` — rare present
    classes approach 1+upper_bound, absent classes get 1.
    """
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_index
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    hist = jnp.sum((labels[..., None] == classes) & valid[..., None],
                   axis=tuple(range(labels.ndim))).astype(jnp.float32)
    hist = hist / jnp.maximum(jnp.sum(hist), 1.0)
    return (hist > 0) * upper_bound * (1.0 - hist) + 1.0


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


def relaxed_multihot(labels: jnp.ndarray, num_classes: int,
                     ignore_index: int, border: int,
                     reduce_now: jnp.ndarray,
                     strict_classes: Optional[Sequence[int]] = None):
    """Device-side border-relaxed multi-hot target — the in-graph equivalent
    of ``data.joint_transforms.RelaxedBoundaryLossToTensor``
    (transforms/transforms.py:75-124): a pixel is 'on' for every class
    present within a (2*border+1)^2 window; ``strict_classes`` keep exact
    one-hot; when ``reduce_now`` (a traced bool: iteration past
    reduce_border_iter) the window halves and 4-neighbor boundary pixels get
    weight 2. Building the target on device keeps the uint8 label wire —
    shipping host-built (C+1,H,W) one-hots would cost 20x the bytes.

    Returns ``(allowed, weight)``: allowed (..., C+1) bool (channel C =
    ignore), weight (...) f32 in {1, 2}. Both windows are computed in one
    pass (the halved window's shifts are a subset) and selected with a
    ``where`` so one program covers the whole schedule. Bit-equivalence with
    the host transform is pinned in tests/test_extras.py.
    """
    a = jnp.where(labels == ignore_index, num_classes, labels)
    half = border // 2
    pad = [(0, 0)] * (a.ndim - 2) + [(border, border), (border, border)]
    ap = jnp.pad(a, pad, constant_values=num_classes)
    h, w = a.shape[-2], a.shape[-1]
    classes = jnp.arange(num_classes + 1, dtype=a.dtype)

    def window_hot(b):
        hot = jnp.zeros(a.shape + (num_classes + 1,), jnp.bool_)
        for i in range(-b, b + 1):
            for j in range(-b, b + 1):
                sh = jax.lax.slice_in_dim(
                    jax.lax.slice_in_dim(ap, border + i, border + i + h,
                                         axis=a.ndim - 2),
                    border + j, border + j + w, axis=a.ndim - 1)
                hot = hot | (sh[..., None] == classes)
        return hot

    full, halved = window_hot(border), window_hot(half)
    allowed = jnp.where(reduce_now, halved, full)
    if strict_classes:
        strict = jnp.isin(a, jnp.asarray(list(strict_classes), a.dtype))
        allowed = jnp.where(strict[..., None], a[..., None] == classes,
                            allowed)
    boundary = jnp.zeros(a.shape, jnp.bool_)
    d0, d1 = a.ndim - 2, a.ndim - 1
    for ax in (d0, d1):
        lo = jax.lax.slice_in_dim(a, 0, a.shape[ax] - 1, axis=ax)
        hi = jax.lax.slice_in_dim(a, 1, a.shape[ax], axis=ax)
        diff = lo != hi
        zero = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=ax),
                              jnp.bool_)
        boundary |= jnp.concatenate([diff, zero], axis=ax)
        boundary |= jnp.concatenate([zero, diff], axis=ax)
    weight = jnp.where(reduce_now & boundary, 2.0, 1.0)
    return allowed, weight


def relaxed_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          num_classes: int, ignore_index: int,
                          border: int, reduce_now: jnp.ndarray,
                          strict_classes: Optional[Sequence[int]] = None
                          ) -> jnp.ndarray:
    """Border-relaxed CE: per valid pixel ``-log P(any allowed class)``,
    boundary pixels weighted 2 after the reduce point — the clean form of
    the RobustNet-lineage relaxed boundary loss the reference's
    config.py:58-64 knobs parameterize (its own consumer was never vendored;
    the spread-softmax variant upstream optimizes the same 'any class in
    the window is acceptable' objective). ``-log sum_allowed softmax`` is
    computed as a masked-logsumexp difference (numerically exact; no
    softmax materialized). Reduces to plain CE at border=0.
    """
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_index
    allowed, weight = relaxed_multihot(labels, num_classes, ignore_index,
                                       border, reduce_now, strict_classes)
    logits_f = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits_f, axis=-1)
    lse_allowed = jax.nn.logsumexp(
        jnp.where(allowed[..., :num_classes], logits_f, -jnp.inf), axis=-1)
    w = jnp.where(valid, weight, 0.0)
    nll = jnp.where(valid, lse - lse_allowed, 0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
