"""Normalization & whitening zoo — one factory for every iw-code.

Mirrors the reference's per-block ``iw`` plan (network/Resnet.py:79-113):
  0: BatchNorm only (the block's own BNs are always present)
  1/2: InstanceWhitening after the residual add, feature map collected for
       the ISW/IRW whitening loss (network/instance_whitening.py:5-16)
  3: InstanceNorm(affine=False)
  4: InstanceNorm(affine=True)
  5: SyncSwitchWhiten2d (network/sync_switchwhiten.py:59-223)

TPU-native sync semantics: the reference needs NCCL all_reduce for SyncBN
(config.py:92-93) and for SyncSwitchWhiten's mean/cov (sync_switchwhiten.py:
22,26,44-45). Here every batch statistic is a reduction over the *logical*
batch axis of a jit-compiled program — GSPMD emits the ICI all-reduce when
the batch is sharded, and the backward pass of that reduction is exactly the
gradient all-reduce the reference hand-writes in SyncMeanCov.backward.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNorm(nn.Module):
    """torch-exact (Sync)BatchNorm2d.

    Train: normalize with biased batch stats over (N,H,W); update running
    stats with momentum 0.1 and the *unbiased* batch variance (torch
    convention). Eval: normalize with running stats. Stats math in fp32
    regardless of input dtype.
    """

    features: int
    momentum: float = 0.1  # torch convention: r = (1-m)*r + m*batch
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool, stats=None):
        """``stats``: optional precomputed ``(sum, sumsq, count)`` fp32
        per-channel sums of ``x`` (a producer with a fused stats epilogue,
        ops/pallas_dot_stats.py). Identical math to the in-place reduction
        — mean = s1/n, biased var = s2/n - mean^2 — without re-reading x."""
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        xf = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            if stats is not None:
                s1, s2, n = stats
                mean = s1 / n
                var = s2 / n - jnp.square(mean)
            else:
                n = 1
                for a in axes:
                    n *= x.shape[a]
                mean = jnp.mean(xf, axis=axes)
                var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            inv = inv * scale
            out = xf * inv + (bias - mean * inv)
        else:
            out = (xf - mean) * inv
        return out.astype(x.dtype)


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d: per-sample per-channel stats over (H,W).

    torch defaults: eps=1e-5, biased variance, no running stats — identical
    behavior in train and eval.
    """

    features: int
    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out * scale + bias
        return out.astype(x.dtype)


class InstanceWhitening(nn.Module):
    """Instance standardization that also returns the standardized map ``w``
    for the downstream whitening loss (network/instance_whitening.py:5-16)."""

    features: int

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        out = InstanceNorm(self.features, affine=False, name="instance_standardization")(x)
        return out, out


class SwitchWhiten2d(nn.Module):
    """(Sync)SwitchWhiten2d — grouped switchable whitening via Newton-Schulz.

    Faithful port of network/sync_switchwhiten.py:59-223. sw_type selects the
    statistics blend: 2 = BW+IW, 3 = BW+IW+LN, 5 = BW+IW+BN+IN+LN. T is the
    Newton-Schulz iteration count for cov^{-1/2}. Batch (BW) statistics are
    global-batch reductions — sync across devices for free under GSPMD, so
    this single class covers both switchwhiten.py and sync_switchwhiten.py.
    """

    features: int
    num_pergroup: int = 16
    sw_type: int = 2
    T: int = 5
    tie_weight: bool = False
    eps: float = 1e-5
    momentum: float = 0.99  # running = m*running + (1-m)*batch (reference :28-31)
    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        if self.sw_type not in (2, 3, 5):
            raise ValueError(f"sw_type {self.sw_type} not in (2,3,5)")
        N, H, W, C = x.shape
        c, g = self.num_pergroup, self.features // self.num_pergroup
        k = self.sw_type

        mean_w = self.param("sw_mean_weight", nn.initializers.ones, (k,), jnp.float32)
        if self.tie_weight:
            var_w = mean_w
        else:
            var_w = self.param("sw_var_weight", nn.initializers.ones, (k,), jnp.float32)

        run_mean = self.variable("batch_stats", "running_mean",
                                 lambda: jnp.zeros((g, c, 1), jnp.float32))
        run_cov = self.variable(
            "batch_stats", "running_cov",
            lambda: jnp.tile(jnp.eye(c, dtype=jnp.float32)[None], (g, 1, 1)))

        xf = x.astype(jnp.float32).reshape(N, H, W, g, c)

        # --- batch (BW) statistics: global over (N,H,W) per (g,c) ---
        if train:
            mean_bn = jnp.mean(xf, axis=(0, 1, 2))[..., None]           # (g,c,1)
            xc = xf - mean_bn[None, None, None, :, :, 0]
            cov_bn = jnp.einsum("nhwgc,nhwgd->gcd", xc, xc) / (N * H * W)
            if not self.is_initializing():
                m = self.momentum
                run_mean.value = m * run_mean.value + (1 - m) * mean_bn
                run_cov.value = m * run_cov.value + (1 - m) * cov_bn
        else:
            mean_bn, cov_bn = run_mean.value, run_cov.value

        # --- instance (IW) statistics per (n,g) over (H,W) ---
        mean_in = jnp.mean(xf, axis=(1, 2))[..., None]                  # (n,g,c,1)
        xin = xf - mean_in[:, None, None, :, :, 0]
        cov_in = jnp.einsum("nhwgc,nhwgd->ngcd", xin, xin) / (H * W)

        eye = jnp.eye(c, dtype=jnp.float32)
        mean_bn_b = jnp.broadcast_to(mean_bn[None], (N, g, c, 1))
        cov_bn_b = jnp.broadcast_to(cov_bn[None], (N, g, c, c))

        if self.sw_type in (3, 5):
            flat = xf.reshape(N, -1)
            mean_ln = jnp.mean(flat, axis=-1)                            # (n,)
            var_ln = jnp.var(flat, axis=-1, ddof=1)                      # torch .var default unbiased
            mean_ln = mean_ln[:, None, None, None]                       # (n,1,1,1) -> bcast over (g,c)
            var_ln = var_ln[:, None, None, None] * eye                   # (n,g,c,c) broadcast
            var_ln = jnp.broadcast_to(var_ln, (N, g, c, c))
        if self.sw_type == 5:
            var_bn = jax.vmap(jax.vmap(jnp.diag))(jnp.diagonal(cov_bn_b, axis1=-2, axis2=-1))
            var_in = jax.vmap(jax.vmap(jnp.diag))(jnp.diagonal(cov_in, axis1=-2, axis2=-1))

        mw = jax.nn.softmax(mean_w)
        vw = jax.nn.softmax(var_w) if not self.tie_weight else mw

        if self.sw_type == 2:
            mean = mw[0] * mean_bn_b + mw[1] * mean_in
            cov = vw[0] * cov_bn_b + vw[1] * cov_in + self.eps * eye
        elif self.sw_type == 3:
            mean = mw[0] * mean_bn_b + mw[1] * mean_in + mw[2] * mean_ln
            cov = vw[0] * cov_bn_b + vw[1] * cov_in + vw[2] * var_ln + self.eps * eye
        else:  # 5
            mean = (mw[0] + mw[2]) * mean_bn_b + (mw[1] + mw[3]) * mean_in + mw[4] * mean_ln
            cov = (vw[0] * cov_bn_b + vw[1] * cov_in + vw[0] * var_bn +
                   vw[1] * var_in + vw[4] * var_ln + self.eps * eye)

        # --- Newton-Schulz iteration for cov^{-1/2} (reference :206-215) ---
        P = jnp.broadcast_to(eye, cov.shape)
        rTr = 1.0 / jnp.trace(cov, axis1=-2, axis2=-1)[..., None, None]
        cov_n = cov * rTr
        for _ in range(self.T):
            P3 = P @ P @ P
            P = 1.5 * P - 0.5 * (P3 @ cov_n)
        wm = P * jnp.sqrt(rTr)                                           # (n,g,c,c)

        xin_full = xf - mean[:, None, None, :, :, 0]                     # (n,h,w,g,c)
        x_hat = jnp.einsum("ngdc,nhwgc->nhwgd", wm, xin_full)
        x_hat = x_hat.reshape(N, H, W, C)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            x_hat = x_hat * scale + bias
        return x_hat.astype(x.dtype)


# --- factory -----------------------------------------------------------------

IW_NONE, IW_W1, IW_W2, IW_IN, IW_IN_AFFINE, IW_SW = 0, 1, 2, 3, 4, 5


def make_iw_layer(iw: int, features: int, name: str) -> Optional[nn.Module]:
    """Instantiate the post-residual layer for an iw code (0 -> None).

    Codes 1/2 return a module whose call yields (x, w); 3/4/5 yield x.
    """
    if iw == 0:
        return None
    if iw in (IW_W1, IW_W2):
        return InstanceWhitening(features, name=name)
    if iw == IW_IN:
        return InstanceNorm(features, affine=False, name=name)
    if iw == IW_IN_AFFINE:
        return InstanceNorm(features, affine=True, name=name)
    if iw == IW_SW:
        return SwitchWhiten2d(features, num_pergroup=16, sw_type=2, T=5,
                              tie_weight=False, eps=1e-5, momentum=0.99,
                              affine=True, name=name)
    raise ValueError(f"unknown iw code {iw}")


def apply_iw(layer: Optional[nn.Module], iw: int, x, w_arr: list, train: bool):
    """Apply a factory-made iw layer, collecting w for codes 1/2."""
    if layer is None:
        return x
    if iw in (IW_W1, IW_W2):
        x, w = layer(x)
        w_arr.append(w)
        return x
    if iw == IW_SW:
        return layer(x, train)
    return layer(x)
