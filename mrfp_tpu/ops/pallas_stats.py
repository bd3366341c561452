"""Pallas TPU kernel: per-channel sum and sum-of-squares in one pass.

**Verified-but-not-faster; production routes to the jnp path** (same honest
bookkeeping as ops/pallas_np_plus.py). The investigation, 2026-08-17, v5e-1
via the axon tunnel:

Train-mode BatchNorm needs (E[x], E[x^2]) over (N, H, W) for every conv
output (norms.py:51-52; reference mynn.Norm2d / torch BN semantics); the
~70 stat reductions are ~19 ms of the ~151 ms MRFP+ train step and looked
like the next byte lever (they re-read every conv output once). Measured
with 604 MB on-device probes, this chip's *effective* HBM streaming is far
below the 819 GB/s spec:

  pallas copy kernel (read+write)   3.31 ms -> 364 GB/s combined
  XLA  scale  x*1.0001 (read+write) 3.60 ms -> 336 GB/s combined
  pallas block-sum (read only)      3.34 ms -> 181 GB/s
  XLA  convert+reduce (read only)   2.25 ms -> 268 GB/s

i.e. XLA's convert_reduce fusion already runs AT or ABOVE the platform's
demonstrated unidirectional read rate — there is nothing for a custom
kernel to win; the BN stat pass is a hardware floor here, not an XLA
inefficiency. Kernel variants tried and their clean-harness numbers:
pure-VPU strided accumulate to an (8, W) f32 block (77 GB/s), direct
(1, W) accumulate (77), 1024/2048-lane row views (73-76), and an all-ones
MXU dot (worse still: with only 8 output rows the systolic array has no
lhs reuse and ingests the rhs at ~128 elem/cycle).

The kernel below (strided-VPU form) is kept as a correct, tested reference
(interpret-mode tests in tests/test_pallas_kernels.py) in case a future
libtpu/platform changes the calculus; ``channel_sums``/``channel_stats``
route to XLA reductions everywhere.

Channels that don't fill the 128-lane tile are handled by viewing the flat
(M, C) map as (M/g, lcm(C,128)) rows — g consecutive pixels per row — and
folding the g channel copies outside the kernel (cheap: the fold is on a
[g, C] vector).

Gradient: d(sum)/dx = 1, d(sumsq)/dx = 2x — a fused elementwise map, so
``channel_sums`` carries a custom VJP and the backward costs one extra
elementwise pass that XLA fuses into the existing BN backward.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
_VMEM_BYTES = 4 * 1024 * 1024  # per-block input budget


def _sums_kernel(x_ref, s1_ref, s2_ref):
    """Strided VPU accumulate into an (8, W) f32 block: rows fold 8-at-a-time
    so every add is a full-width (8, 128)-register op with no cross-sublane
    shuffles inside the loop; the 8-row fold happens once, outside the
    kernel. (An all-ones MXU dot was measured 3x *slower* — with only 8
    output rows the systolic array has no lhs reuse and ingests the rhs at
    ~128 elem/cycle; an unstrided jnp.sum straight to (1, W) was ~2x slower
    than this form.)"""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    bm, w = x_ref.shape
    xf = x_ref[:].astype(jnp.float32).reshape(bm // 8, 8, w)
    s1_ref[:] += jnp.sum(xf, axis=0)
    s2_ref[:] += jnp.sum(xf * xf, axis=0)


def _block_rows(rows: int, width: int, itemsize: int) -> int:
    """Largest power-of-two divisor of ``rows`` that fits the VMEM budget
    (block rows must be a multiple of 8 sublanes)."""
    cap = max(8, _VMEM_BYTES // (width * itemsize))
    bm = rows & -rows                      # largest 2-power dividing rows
    while bm > cap:
        bm //= 2
    return bm


@functools.partial(jax.jit, static_argnames=("interpret",))
def _channel_sums_pallas(x: jnp.ndarray, interpret: bool = False):
    c = x.shape[-1]
    m = math.prod(x.shape[:-1])
    g = math.lcm(c, _LANES) // c          # pixels folded per row
    width = c * g
    rows = m // g
    xv = x.reshape(rows, width)
    bm = _block_rows(rows, width, x.dtype.itemsize)
    s1, s2 = pl.pallas_call(
        _sums_kernel,
        grid=(rows // bm,),
        in_specs=[pl.BlockSpec((bm, width), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((8, width), lambda i: (0, 0)),
                   pl.BlockSpec((8, width), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((8, width), jnp.float32)] * 2,
        interpret=interpret,
    )(xv)
    # fold the 8 sublane partials, then the g folded pixel copies (if any)
    s1 = jnp.sum(s1.reshape(8 * g, c), axis=0)
    s2 = jnp.sum(s2.reshape(8 * g, c), axis=0)
    return s1, s2


def _supported(x: jnp.ndarray) -> bool:
    if x.ndim < 2:
        return False
    c = x.shape[-1]
    m = math.prod(x.shape[:-1])
    g = math.lcm(c, _LANES) // c
    if m % g or m // g < 8:
        return False
    rows = m // g
    return (rows & -rows) >= 8            # block rows must be 8-divisible


def _channel_sums_jnp(x: jnp.ndarray):
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=axes), jnp.sum(xf * xf, axis=axes)


@jax.custom_vjp
def channel_sums(x: jnp.ndarray):
    """(sum(x), sum(x*x)) over all leading axes, per trailing channel, f32.

    Routes to plain XLA reductions on every backend — the measured winner
    (module docstring); the Pallas kernel stays available via
    ``_channel_sums_pallas`` for benchmarking/interpret tests.
    """
    return _channel_sums_jnp(x)


def _sums_fwd(x):
    return channel_sums(x), x


def _sums_bwd(x, g):
    g1, g2 = g
    dx = g1.astype(jnp.float32) + 2.0 * x.astype(jnp.float32) * g2
    return (dx.astype(x.dtype),)


channel_sums.defvjp(_sums_fwd, _sums_bwd)


def channel_stats(x: jnp.ndarray):
    """(mean, biased var) per channel over all leading axes, f32 — the
    train-mode BN moments (norms.py BatchNorm; torch biased-var semantics)."""
    n = math.prod(x.shape[:-1])
    s1, s2 = channel_sums(x)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    return mean, var
