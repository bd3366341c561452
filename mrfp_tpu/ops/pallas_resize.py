"""Pallas TPU kernel: spatial row-mix (resize) that preserves NHWC layout.

The XLA einsum form of the one-hot resize (ops/resize.py `_take_rows`,
impl='matmul') contracts a *spatial* dim of an NHWC tensor. The TPU dot
emitter then wants that spatial dim minor-most, so XLA lays the operand out
W-minor (e.g. ``bf16[8,384,384,256]{2,3,1,0}``) and inserts full-tensor
layout-transpose copies on both sides of every resize — profiled at ~16 GB
(~20 ms) per MRFP+ train step across the OC branch's fractional resizes
(reference deepv3.py:320-327).

This kernel does the same one-hot contraction as in-VMEM MXU dots over
C-minor blocks, so the operand and result keep the canonical NHWC layout and
the copies disappear:

- axis=1 (H-resize): (w, c) fold into one trailing axis (a free bitcast for
  C-minor row-major); grid (N, wc/TILE), one ``P @ x[n, :, tile]`` MXU dot
  per column tile.
- axis=2 (W-resize): grid (N, H); each program loads one contiguous row
  ``x[n, h] : (W, C)`` and computes ``P @ row`` — one MXU matmul per row.

``P`` is the (out, in) selection matrix. For nearest resizes it is one-hot
(exact in bf16); the transpose rule (custom VJP) runs the same kernel with
``P^T`` — rows with several ones accumulate in fp32, replacing the
serialized scatter-add XLA would emit for a gather backward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024  # per-block soft budget (VMEM is ~16 MB/core)


def _precision(dtype):
    # f32 operands need HIGHEST or the TPU dot silently rounds them to bf16,
    # corrupting an exact one-hot selection. bf16 operands lose nothing at
    # the default precision (and HIGHEST on bf16 crashes the Mosaic
    # compile helper on the axon backend).
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)


def _mix_h_kernel(p_ref, x_ref, o_ref):
    # x: (H_in, TILE) [a (w*c) column tile; N squeezed], p: (H_out, H_in),
    # o: (H_out, TILE)
    o_ref[...] = jax.lax.dot_general(
        p_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
        precision=_precision(x_ref.dtype),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _mix_w_kernel(p_ref, x_ref, o_ref):
    # x: (1, 1, W_in, C), p: (W_out, W_in), o: (1, 1, W_out, C)
    o_ref[0, 0] = jax.lax.dot_general(
        p_ref[...], x_ref[0, 0], (((1,), (0,)), ((), ())),
        precision=_precision(x_ref.dtype),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _onehot_np(idx: Tuple[int, ...], in_size: int, transpose: bool):
    P = np.zeros((len(idx), in_size), np.float32)
    P[np.arange(len(idx)), list(idx)] = 1.0
    return P.T.copy() if transpose else P


def row_mix_pallas(x: jnp.ndarray, P: np.ndarray, axis: int,
                   interpret: bool = False) -> jnp.ndarray:
    """``out = P @ x`` along spatial ``axis`` (1 or 2) of NHWC ``x``."""
    n, h, w, c = x.shape
    out, in_size = P.shape
    assert x.shape[axis] == in_size, (x.shape, P.shape, axis)
    Pd = jnp.asarray(P, x.dtype)
    if axis == 1:
        # Fold (w, c) into one trailing axis — a free bitcast for the
        # C-minor row-major layout — so the kernel is a plain 2-D dot over
        # (H_in, TILE) column tiles. (A 4-D block with an in-kernel W loop
        # hits Mosaic's unsupported 2D->4D shape cast for bf16 stores.)
        wc = w * c
        tile = 2048
        while tile > wc:
            tile //= 2
        if wc < 128 or (h + out) * tile * x.dtype.itemsize > _VMEM_BUDGET:
            return jnp.einsum("oh,nhwc->nowc", Pd, x,
                              precision=_precision(x.dtype))
        xr = x.reshape(n, h, wc)
        y = pl.pallas_call(
            _mix_h_kernel,
            grid=(n, pl.cdiv(wc, tile)),
            in_specs=[
                pl.BlockSpec((out, in_size), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, in_size, tile), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, out, tile), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, out, wc), x.dtype),
            interpret=interpret,
        )(Pd, xr)
        return y.reshape(n, out, w, c)
    if axis == 2:
        if (in_size + out) * c * x.dtype.itemsize > _VMEM_BUDGET:
            return jnp.einsum("ow,nhwc->nhoc", Pd, x,
                              precision=_precision(x.dtype))
        grid = (n, h)
        return pl.pallas_call(
            _mix_w_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((out, in_size), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, in_size, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, out, c), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, out, c), x.dtype),
            interpret=interpret,
        )(Pd, x)
    raise ValueError(f"axis must be 1 or 2, got {axis}")


# ---------------------------------------------------------------------------
# Fused H+W separable resize: ONE kernel per resize site.
#
# The general form is a weighted-taps mix:
#     out[n, i] = sum_k wts[k, i] * (P @ x[n, inv[k, i]])        # (W_o, C) rows
# where inv/wts ride along as scalar-prefetch operands (the H selection is
# the input BlockSpec's index_map — free DMA) and P mixes the contiguous
# (W, C) row on the MXU. No reshapes, no separate H pass, and everything
# keeps the canonical C-minor NHWC layout, so XLA stops inserting the
# full-tensor transpose copies it needs around spatial-contraction einsums.
#
# Instances:
# - nearest fwd:  m=1, wts=1, P = one-hot(ix)            (out = x[:,iy][:,:,ix])
# - nearest bwd:  m = max multiplicity of iy^-1, wts = 0/1 mask, P = one-hot^T
#   (fp32 MXU accumulation instead of XLA's serialized scatter-add)
# - bilinear fwd: m=2, wts=(1-f, f), P = dense two-tap W matrix
# - bilinear bwd: m = max weighted multiplicity, wts = lerp weights, P^T
# ---------------------------------------------------------------------------


def _make_taps_kernel(m: int):
    def kernel(inv_ref, wt_ref, p_ref, *refs):
        x_refs, o_ref = refs[:m], refs[m]
        del inv_ref  # consumed by the index_maps
        i = pl.program_id(1)
        acc = jnp.zeros(o_ref.shape[2:], jnp.float32)
        for k in range(m):
            part = jax.lax.dot_general(
                p_ref[...], x_refs[k][0, 0], (((1,), (0,)), ((), ())),
                precision=_precision(x_refs[k].dtype),
                preferred_element_type=jnp.float32)
            acc = acc + part * wt_ref[k, i]
        o_ref[0, 0] = acc.astype(o_ref.dtype)
    return kernel


def _taps_mix(x, inv: np.ndarray, wts: np.ndarray, P: np.ndarray,
              interpret: bool):
    """out[n, i] = sum_k wts[k, i] * P @ x[n, inv[k, i]] (see header)."""
    n, h, w, c = x.shape
    m, ho = inv.shape
    po, pi = P.shape
    assert pi == w, (P.shape, x.shape)
    Pd = jnp.asarray(P, x.dtype)
    in_specs = [pl.BlockSpec((po, pi), lambda n_, i, inv_r, wt_r: (0, 0))]

    def _tap_index_map(k):
        return lambda n_, i, inv_r, wt_r: (n_, inv_r[k, i], 0, 0)

    for k in range(m):
        in_specs.append(pl.BlockSpec((1, 1, w, c), _tap_index_map(k)))
    return pl.pallas_call(
        _make_taps_kernel(m),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, ho),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, po, c), lambda n_, i, inv_r, wt_r: (n_, i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, ho, po, c), x.dtype),
        interpret=interpret,
    )(jnp.asarray(inv, jnp.int32), jnp.asarray(wts, jnp.float32), Pd,
      *([x] * m))


@functools.lru_cache(maxsize=None)
def _weighted_inverse(taps, in_size: int):
    """Invert H taps ((idx, wts), ...) -> (inv[m, in_size], wts[m, in_size]).

    Input row h receives output row i with weight w for every tap vector
    where idx[i] == h, w != 0; m is the max bucket size (>= 1).
    """
    buckets = [[] for _ in range(in_size)]
    for idx, wts in taps:
        for i, (h, wt) in enumerate(zip(idx, wts)):
            if wt != 0.0:
                buckets[h].append((i, wt))
    m = max(1, max(len(b) for b in buckets))
    inv = np.zeros((m, in_size), np.int32)
    w_arr = np.zeros((m, in_size), np.float32)
    for h, b in enumerate(buckets):
        for k, (i, wt) in enumerate(b):
            inv[k, h] = i
            w_arr[k, h] = wt
    return inv, w_arr


@functools.lru_cache(maxsize=None)
def _dense_np(taps, in_size: int, transpose: bool):
    """Dense (out, in) mix matrix from W taps ((idx, wts), ...)."""
    out = len(taps[0][0])
    P = np.zeros((out, in_size), np.float32)
    for idx, wts in taps:
        for j, (w, wt) in enumerate(zip(idx, wts)):
            P[j, w] += wt
    return P.T.copy() if transpose else P


def _ones(idx):
    return tuple(1.0 for _ in idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def resize_nearest_fused(x: jnp.ndarray, iy: Tuple[int, ...],
                         ix: Tuple[int, ...],
                         interpret: bool = False) -> jnp.ndarray:
    """Fused nearest resize ``x[:, iy][:, :, ix]`` in one layout-preserving
    Pallas kernel; differentiable. ``iy``/``ix`` are static int tuples."""
    inv = np.asarray(iy, np.int32)[None]
    wts = np.ones((1, len(iy)), np.float32)
    return _taps_mix(x, inv, wts, _dense_np(((ix, _ones(ix)),), x.shape[2],
                                            False), interpret)


def _rn_fwd(x, iy, ix, interpret):
    return resize_nearest_fused(x, iy, ix, interpret), (x.shape[1], x.shape[2])


def _rn_bwd(iy, ix, interpret, hw, g):
    h, w = hw
    inv, wts = _weighted_inverse(((iy, _ones(iy)),), h)
    return (_taps_mix(g, inv, wts, _dense_np(((ix, _ones(ix)),), w, True),
                      interpret),)


resize_nearest_fused.defvjp(_rn_fwd, _rn_bwd)

# H/W tap spec for bilinear: ((idx0, wts0), (idx1, wts1)) as nested tuples
TapSpec = Tuple[Tuple[Tuple[int, ...], Tuple[float, ...]], ...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def resize_bilinear_fused(x: jnp.ndarray, htaps: TapSpec, wtaps: TapSpec,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused separable two-tap (bilinear) resize; differentiable. The lerp
    runs in fp32 on the MXU (at least as accurate as a dtype-native lerp)."""
    (i0, w0), (i1, w1) = htaps
    inv = np.stack([np.asarray(i0, np.int32), np.asarray(i1, np.int32)])
    wts = np.stack([np.asarray(w0, np.float32), np.asarray(w1, np.float32)])
    return _taps_mix(x, inv, wts, _dense_np(wtaps, x.shape[2], False),
                     interpret)


def _rb_fwd(x, htaps, wtaps, interpret):
    return (resize_bilinear_fused(x, htaps, wtaps, interpret),
            (x.shape[1], x.shape[2]))


def _rb_bwd(htaps, wtaps, interpret, hw, g):
    h, w = hw
    inv, wts = _weighted_inverse(htaps, h)
    return (_taps_mix(g, inv, wts, _dense_np(wtaps, w, True), interpret),)


resize_bilinear_fused.defvjp(_rb_fwd, _rb_bwd)


def _take_fwd_impl(x, idx, in_size, axis, interpret):
    P = _onehot_np(idx, in_size, False)
    return row_mix_pallas(x, P, axis, interpret)


def _take_bwd_impl(g, idx, in_size, axis, interpret):
    P = _onehot_np(idx, in_size, True)          # (in_size, out)
    return row_mix_pallas(g, P, axis, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def take_rows(x: jnp.ndarray, idx: Tuple[int, ...], axis: int,
              interpret: bool = False) -> jnp.ndarray:
    """Differentiable layout-preserving ``jnp.take(x, idx, axis)`` for NHWC
    spatial axes. ``idx`` must be a tuple of Python ints (static)."""
    return _take_fwd_impl(x, idx, x.shape[axis], axis, interpret)


def _take_fwd(x, idx, axis, interpret):
    return take_rows(x, idx, axis, interpret), x.shape[axis]


def _take_bwd(idx, axis, interpret, in_size, g):
    return (_take_bwd_impl(g, idx, in_size, axis, interpret),)


take_rows.defvjp(_take_fwd, _take_bwd)
