"""Fused 1x1-conv (dot) + BN-statistics epilogue — the round-3 byte lever.

Motivation (profiled, CLAUDE.md): the 768^2 MRFP+ train step is at the HBM
roofline and ~23 ms/step goes to XLA's BN-stat convert_reduce fusions, which
RE-READ each conv output to form per-channel (sum, sum-of-squares). Those
re-reads already run at the measured platform read floor, so a standalone
stats kernel cannot win (ops/pallas_stats.py, 6 measured negatives). The
only way to eliminate the bytes is to emit the stats from the producer while
the tile is still in VMEM. A full Mosaic conv is out of scope, but every
ResNet bottleneck 1x1 conv (conv1/conv3/downsample, network/Resnet.py:
148-227) is a dot on the flattened map — same trick as nn/layers.py
PointwiseConv — and each is immediately followed by BatchNorm.

``dot_with_stats(x2d, w)`` returns ``(y, s1, s2)`` where ``s1 = sum_m y``
and ``s2 = sum_m y^2`` per output channel, accumulated in fp32 in VMEM
scratch across the sequential TPU grid. The custom_vjp keeps the backward
pure-XLA: the stats cotangents fold into an effective dY = dy + ds1 +
2*y*ds2 that XLA fuses into the two transpose matmuls, so the backward
costs exactly what the unfused form costs.

MEASURED NEGATIVE RESULT (v5e-1, 2026-08-17; the VERDICT round-2 item-2
attempt) — keep ``fuse_bn_stats`` default-OFF:

  full MRFP+ 768^2 bs8 train step   img/s/chip
    baseline (1x1 as nn.Conv)          59.4
    fuse_bn_stats (this kernel)        41.7
    fuse_bn_stats (XLA-dot fallback)   41.7   <- same regression
  isolated kernel (L1.conv3/conv1/down, L2.conv3, chained x8):
    fused vs unfused XLA dot: parity within +-5% on every shape.

Diagnosis: the stats fusion itself breaks even at the kernel level (XLA
already keeps the dot output hot for its reduce consumers), and the step-
level 30% regression is the DOT FORM: replacing bottleneck 1x1 convs with
dots pins standard {3,2,1,0} layouts against the 3x3 convs'
batch-in-sublanes layout, re-introducing exactly the relayout copies the
round-2 final2 fix removed elsewhere. Eliminating the BN-stat re-reads
therefore requires a true Mosaic *conv* kernel with a stats epilogue
(keeping conv layouts end-to-end) — out of scope; this module stays as the
verified-correct, opt-in implementation + measurement record (same
treatment as ops/pallas_np_plus.py).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 8 * 1024 * 1024

# Trace-time opt-in (cfg.train.fuse_bn_stats -> make_jitted_steps): the
# bottleneck 1x1+BN pairs route through the fused dot only when this is set,
# so parity tests and the eval graph keep the reference-shaped convs.
_FUSE = contextvars.ContextVar("mrfp_fuse_bn_stats", default=False)


@contextlib.contextmanager
def bn_stats_fusion(enabled: bool = True):
    tok = _FUSE.set(enabled)
    try:
        yield
    finally:
        _FUSE.reset(tok)


def bn_stats_fusion_active() -> bool:
    """True when tracing a program that wants fused 1x1-conv+BN-stats
    (requires the Pallas-allowed context — multi-device traces disable it)."""
    from mrfp_tpu.ops.resize import _PALLAS_OK
    return _FUSE.get() and _PALLAS_OK.get()


def _kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref, acc1, acc2):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    y = jnp.dot(x_ref[:].astype(jnp.float32), w_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    # fp32 stats of the STORED value: BN must see exactly what the next layer
    # sees, so square/sum the rounded output, not the f32 accumulator
    ys = y_ref[:].astype(jnp.float32)
    acc1[:] += jnp.sum(ys, axis=0, keepdims=True)
    acc2[:] += jnp.sum(ys * ys, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        s1_ref[:] = acc1[:]
        s2_ref[:] = acc2[:]


def _pick_tile(m: int, cin: int, cout: int, itemsize: int) -> int:
    tile = 4096
    while tile > 8 and (tile * (cin + cout) * itemsize
                        + cin * cout * 4) > _VMEM_BUDGET:
        tile //= 2
    while m % tile and tile > 8:
        tile //= 2
    return tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dot_with_stats(x, w, interpret: bool = False):
    """``y = x @ w`` plus per-column fp32 (sum, sumsq) of ``y``.

    x: (M, Cin), w: (Cin, Cout). Returns (y (M, Cout) in x.dtype,
    s1 (Cout,) f32, s2 (Cout,) f32). Falls back to plain XLA off-TPU or
    when the shapes don't tile.
    """
    return _fwd_impl(x, w, interpret)


def _xla_fallback(x, w):
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jnp.dot(x, w, precision=prec,
                preferred_element_type=jnp.float32).astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def _fwd_impl(x, w, interpret):
    m, cin = x.shape
    cout = w.shape[1]
    tile = _pick_tile(m, cin, cout, x.dtype.itemsize)
    use_pallas = (jax.default_backend() == "tpu" or interpret)
    # cout 64 is accepted: Mosaic pads the lane dim; the wasted lanes are on
    # the small side while the HBM traffic is actual bytes (measured)
    if not use_pallas or m % tile or cout % 64 or cin < 8:
        return _xla_fallback(x, w)
    y, s1, s2 = pl.pallas_call(
        _kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, cout), x.dtype),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, cout), jnp.float32),
            pltpu.VMEM((1, cout), jnp.float32),
        ],
        interpret=interpret,
    )(x, w)
    return y, s1[0], s2[0]


def _fwd(x, w, interpret):
    y, s1, s2 = _fwd_impl(x, w, interpret)
    return (y, s1, s2), (x, w, y)


def _bwd(interpret, res, cts):
    x, w, y = res
    dy, ds1, ds2 = cts
    f = jnp.float32
    # stats cotangents fold into an effective dY; XLA fuses the elementwise
    # prologue into both transpose dots (no extra pass over y)
    dY = (dy.astype(f) + ds1[None, :].astype(f)
          + 2.0 * y.astype(f) * ds2[None, :].astype(f))
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    dx = jnp.dot(dY.astype(x.dtype), w.T, precision=prec)
    dw = jnp.dot(x.T.astype(f), dY, precision=prec).astype(w.dtype)
    return dx.astype(x.dtype), dw


dot_with_stats.defvjp(_fwd, _bwd)
