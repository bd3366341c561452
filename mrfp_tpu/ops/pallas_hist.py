"""Pallas TPU kernel: confusion matrix as one-hot matmuls on the MXU.

The jnp path (ops.hist) lowers to an XLA scatter-add — serialized updates on
TPU. This kernel instead builds per-block one-hot matrices and accumulates
``onehot(label)^T @ onehot(pred)`` on the systolic array: a 1024x2048 eval
image becomes ~128 MXU matmuls instead of 2M scattered adds.

Classes are padded to 128 lanes (the MXU tile width); invalid labels (the
ignore_index pixels and the -1 padding the wrapper adds) zero out their
one-hot row, so they never contribute — same semantics as
metrics.fast_hist (metrics.py:122-126).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_COLS = 512
_BLOCK_ROWS = 8  # pixels per grid step = _BLOCK_ROWS * _COLS


def _hist_kernel(pred_ref, label_ref, out_ref, *, num_classes: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = pred_ref[:][:, :, None]                              # (R, COLS, 1)
    l = label_ref[:][:, :, None]
    rows, cols = pred_ref.shape
    classes = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, _LANES), 2)
    valid = (l >= 0) & (l < num_classes)
    oh_pred = ((p == classes) & valid).astype(jnp.float32)
    oh_label = ((l == classes) & valid).astype(jnp.float32)
    # batched matmul over the row axis -> (R, LANES, LANES), reduce rows
    partial = jax.lax.dot_general(
        oh_label, oh_pred, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] += jnp.sum(partial, axis=0)


def confusion_matrix_pallas(pred: jnp.ndarray, label: jnp.ndarray,
                            num_classes: int,
                            interpret: bool = False) -> jnp.ndarray:
    """(C,C) int32 confusion matrix; rows = label, cols = pred."""
    if num_classes > _LANES:
        raise ValueError(f"num_classes {num_classes} > {_LANES}")
    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    n = pred.shape[0]
    per_block = _BLOCK_ROWS * _COLS
    blocks = max(1, -(-n // per_block))
    pad = blocks * per_block - n
    if pad:
        pred = jnp.pad(pred, (0, pad), constant_values=0)
        label = jnp.pad(label, (0, pad), constant_values=-1)  # -1 -> invalid
    pred2 = pred.reshape(blocks * _BLOCK_ROWS, _COLS)
    label2 = label.reshape(blocks * _BLOCK_ROWS, _COLS)

    out = pl.pallas_call(
        functools.partial(_hist_kernel, num_classes=num_classes),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, _COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, _COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_LANES, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_LANES, _LANES), jnp.float32),
        interpret=interpret,
    )(pred2, label2)
    return out[:num_classes, :num_classes].astype(jnp.int32)


def confusion_matrix_auto(pred, label, num_classes: int) -> jnp.ndarray:
    """Pallas on TPU, interpret/jnp fallback elsewhere."""
    if jax.default_backend() == "tpu":
        return confusion_matrix_pallas(pred, label, num_classes)
    from mrfp_tpu.ops.hist import confusion_matrix_update
    hist = jnp.zeros((num_classes, num_classes), jnp.int32)
    return confusion_matrix_update(hist, pred, label, num_classes)
