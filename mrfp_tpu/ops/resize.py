"""Spatial resize ops with exact PyTorch semantics, NHWC layout.

The reference relies on two distinct interpolation behaviors that must be
reproduced bit-for-bit for checkpoint parity (SURVEY.md §7 hard parts):

1. ``Upsample`` (network/mynn.py:114-119): ``F.interpolate(mode='bilinear',
   align_corners=True)`` — source coord ``dst * (in-1)/(out-1)``.
2. The OC branch (deepv3.py:320-327) calls ``F.interpolate`` with NO mode, so
   it is **nearest**. With ``scale_factor=s``: ``out = floor(in*s)`` and
   ``src = floor(dst/s)`` (torch>=1.5, recompute_scale_factor=None). With
   ``size=``: ``src = floor(dst*in/out)``. Verified empirically vs torch CPU.

All index arithmetic happens at trace time in float64 numpy (shapes are
static under jit), so the gathers are against constant index vectors — XLA
lowers them to cheap dynamic-slice/gather with no on-device index math. The
two taps of the separable bilinear become two gathers + a VPU lerp, which XLA
fuses with surrounding elementwise work.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Trace-time switch: multi-device programs must not route through Pallas —
# GSPMD cannot partition a pallas_call custom call, so under a sharded batch
# it would all-gather the full feature map to every chip. The einsum one-hot
# forms are plain dots that shard cleanly along batch. make_jitted_steps
# wraps multi-device traces in pallas_kernels_disabled().
_PALLAS_OK = contextvars.ContextVar("mrfp_pallas_resize_ok", default=True)


@contextlib.contextmanager
def pallas_kernels_disabled():
    """Route all resizes through partitionable XLA forms while tracing."""
    tok = _PALLAS_OK.set(False)
    try:
        yield
    finally:
        _PALLAS_OK.reset(tok)


def nearest_out_size(in_hw: Tuple[int, int], scale: Tuple[float, float]) -> Tuple[int, int]:
    """Output size for torch F.interpolate(scale_factor=...): floor(in*s)."""
    return (int(np.floor(in_hw[0] * scale[0])), int(np.floor(in_hw[1] * scale[1])))


def _nearest_idx_from_scale(in_size: int, scale: float) -> np.ndarray:
    out = int(np.floor(in_size * scale))
    # torch nearest with explicit scale: src = floor(dst / scale)
    idx = np.floor(np.arange(out, dtype=np.float64) / np.float64(scale))
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def _nearest_idx_from_size(in_size: int, out_size: int) -> np.ndarray:
    # torch nearest with explicit size: src = floor(dst * in/out)
    idx = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def _onehot_matrix(idx: np.ndarray, in_size: int) -> np.ndarray:
    """(out, in) selection matrix: row o has a single 1 at column idx[o]."""
    P = np.zeros((len(idx), in_size), np.float32)
    P[np.arange(len(idx)), idx] = 1.0
    return P


def _take_rows(x: jnp.ndarray, idx: np.ndarray, axis: int,
               impl: str) -> jnp.ndarray:
    """Gather rows along a spatial axis: XLA gather, one-hot matmul, or a
    layout-preserving Pallas kernel. The matmul form is exact (single 1 per
    row, so even bf16 accumulation is exact) and turns the *backward* pass
    into a transposed matmul on the MXU instead of a serialized scatter-add —
    the scatter is what makes gather-based resizes slow to differentiate on
    TPU. The Pallas form computes the same one-hot dots in VMEM over C-minor
    blocks, so XLA keeps the canonical NHWC layout instead of inserting
    full-tensor transpose copies around every resize (~16 GB/step in the
    MRFP+ train graph — see ops/pallas_resize.py).
    """
    if impl == "auto":
        impl = "matmul" if jax.default_backend() == "tpu" else "gather"
    if impl == "pallas":
        from mrfp_tpu.ops.pallas_resize import take_rows
        return take_rows(x, tuple(int(i) for i in idx), axis)
    if impl == "gather":
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    in_size = x.shape[axis]
    P = jnp.asarray(_onehot_matrix(idx, in_size), x.dtype)
    # HIGHEST for f32: the default TPU dot precision rounds f32 operands to
    # bf16, so even a one-hot selection would corrupt f32 eval activations
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if axis == 1:
        return jnp.einsum("oh,nhwc->nowc", P, x, precision=prec)
    if axis == 2:
        return jnp.einsum("ow,nhwc->nhoc", P, x, precision=prec)
    raise ValueError(axis)


def _fused_nearest_fits(x, oh: int, ow: int) -> bool:
    """VMEM-fit guard for the fused nearest route (mirrors the bilinear
    guard): per-block rows for fwd AND the inverted-taps bwd, plus the dense
    (ow, w) W-mix matrix. The bwd kernel gathers up to m = ceil(oh/h)+1
    cotangent rows of width ow per input row."""
    from mrfp_tpu.ops.pallas_resize import _VMEM_BUDGET
    w, c, h = x.shape[2], x.shape[3], x.shape[1]
    item = x.dtype.itemsize
    fwd = (w + ow) * c * item + ow * w * item
    m = -(-oh // max(h, 1)) + 1
    bwd = (m * ow + w) * c * item + ow * w * item
    return max(fwd, bwd) <= _VMEM_BUDGET


def resize_nearest(x: jnp.ndarray,
                   size: Optional[Tuple[int, int]] = None,
                   scale: Optional[Tuple[float, float]] = None,
                   impl: str = "auto") -> jnp.ndarray:
    """Nearest resize of NHWC ``x`` matching torch F.interpolate defaults.

    Exactly one of ``size`` / ``scale`` must be given; the source-index rule
    differs between the two (see module docstring). ``impl``: 'gather',
    'matmul' (one-hot MXU form, identical values), or 'auto'.
    """
    if (size is None) == (scale is None):
        raise ValueError("pass exactly one of size= or scale=")
    h, w = x.shape[1], x.shape[2]
    if scale is not None:
        iy = _nearest_idx_from_scale(h, scale[0])
        ix = _nearest_idx_from_scale(w, scale[1])
    else:
        if (h, w) == tuple(size):
            return x
        iy = _nearest_idx_from_size(h, size[0])
        ix = _nearest_idx_from_size(w, size[1])
    if impl == "fused":
        # single layout-preserving Pallas kernel for both axes (TPU train
        # hot path — the OC branch); falls back off-TPU, under a mesh, and
        # when a block would not fit VMEM (same guard as the bilinear route:
        # larger-than-expected OC maps must degrade to einsum, not fail at
        # Mosaic compile time)
        if (jax.default_backend() == "tpu" and x.ndim == 4
                and _PALLAS_OK.get() and _fused_nearest_fits(x, len(iy), len(ix))):
            from mrfp_tpu.ops.pallas_resize import resize_nearest_fused
            return resize_nearest_fused(x, tuple(int(i) for i in iy),
                                        tuple(int(i) for i in ix))
        impl = "auto"
    x = _take_rows(x, iy, 1, impl)
    x = _take_rows(x, ix, 2, impl)
    return x


def _bilinear_ac_weights(in_size: int, out_size: int):
    """(idx0, idx1, frac) for align_corners=True bilinear along one axis."""
    if out_size == 1:
        src = np.zeros(1, dtype=np.float64)
    else:
        src = np.arange(out_size, dtype=np.float64) * ((in_size - 1) / (out_size - 1))
    idx0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    idx1 = np.minimum(idx0 + 1, in_size - 1)
    frac = (src - idx0).astype(np.float32)
    return idx0, idx1, frac


def _bilinear_taps(in_size: int, out_size: int):
    """Static two-tap spec ((idx0, 1-f), (idx1, f)) for the fused kernel."""
    i0, i1, f = _bilinear_ac_weights(in_size, out_size)
    return ((tuple(int(i) for i in i0), tuple(float(1 - v) for v in f)),
            (tuple(int(i) for i in i1), tuple(float(v) for v in f)))


def _fused_bilinear_fits(x, ow: int) -> bool:
    c = x.shape[3]
    w = x.shape[2]
    # 3 row blocks (2 taps + out) + the dense (ow, w) matrix must fit VMEM
    from mrfp_tpu.ops.pallas_resize import _VMEM_BUDGET
    need = (2 * w + ow) * c * x.dtype.itemsize + ow * w * x.dtype.itemsize
    return need <= _VMEM_BUDGET


def resize_bilinear_align_corners(x: jnp.ndarray, size: Tuple[int, int],
                                  impl: str = "auto") -> jnp.ndarray:
    """Bilinear align_corners=True resize of NHWC ``x`` (mynn.py Upsample).

    Separable two-tap lerp along H then W; the taps are one-hot selections
    (exact in any dtype) so the 'matmul' impl produces values identical to
    'gather' while differentiating as matmuls.
    """
    h, w = x.shape[1], x.shape[2]
    oh, ow = int(size[0]), int(size[1])
    if (h, w) == (oh, ow):
        return x
    dtype = x.dtype
    if impl == "auto" and jax.default_backend() == "tpu" and x.ndim == 4 \
            and x.shape[3] >= 64 and _PALLAS_OK.get() \
            and _fused_bilinear_fits(x, ow):
        # one layout-preserving Pallas kernel for both axes; skipped for
        # narrow-channel maps (19-class logits) where lane padding would
        # waste most of the tile — those keep the einsum form
        from mrfp_tpu.ops.pallas_resize import resize_bilinear_fused
        return resize_bilinear_fused(x, _bilinear_taps(h, oh),
                                     _bilinear_taps(w, ow))
    if h != oh:
        i0, i1, f = _bilinear_ac_weights(h, oh)
        f = jnp.asarray(f, dtype)[None, :, None, None]
        x = _take_rows(x, i0, 1, impl) * (1 - f) + \
            _take_rows(x, i1, 1, impl) * f
    if w != ow:
        i0, i1, f = _bilinear_ac_weights(w, ow)
        f = jnp.asarray(f, dtype)[None, None, :, None]
        x = _take_rows(x, i0, 2, impl) * (1 - f) + \
            _take_rows(x, i1, 2, impl) * f
    return x
