"""The OC (overcomplete / HRFP) branch — frozen random encoder-decoder.

Reference: deepv3.py:221-254 (construction), :290-306 (re-randomization with
probability 0.5 per step), :320-327 (forward). Eight convs whose weights are
*never trained*; with p<0.5 they are re-drawn every step (Kaiming-normal
convs, BN gamma ~ N(0, 0.5) — network/mynn.py:57-74). The encoder upsamples
features ABOVE input resolution (overcomplete representation) with
nearest-neighbor chains (x1.205, x1.2, x1.2), the decoder brings them back to
(ceil(H/4), ceil(W/4)); the H/2 bottleneck output injects into the DeepLab
decoder for MRFP+ (deepv3.py:355-357).

Per-layer order is conv -> nearest-resize -> BN -> ReLU, exactly as the
reference writes it: BN moments are computed on the *resized* map (nearest
duplication reweights the moments, so the order is load-bearing).

TPU-native design: instead of the reference's host-RNG mutation of device
weights mid-forward (a host sync every other step), the params live in the
train state as a plain pytree and are resampled *in-graph* under ``lax.cond``
from the per-step key — zero host traffic, bitwise reproducible.

The BNs run in train mode in the reference (stats from the current batch;
running buffers are re-randomized or unused), so here they are plain
batch-stat normalization; under a sharded batch the moments reduce over the
global batch (the SyncBN semantics the reference gets via cfg.BNFUNC).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from mrfp_tpu.ops.resize import resize_nearest

# (name, in_ch, out_ch, dilation); padding == dilation keeps spatial size.
_LAYERS: Tuple[Tuple[str, int, int, int], ...] = (
    ("enc1", 64, 64, 1),
    ("enc2", 64, 64, 1),
    ("enc3", 64, 128, 2),
    ("enc4", 128, 256, 2),
    ("dec1", 256, 128, 1),
    ("dec2", 128, 64, 1),
    ("dec3", 64, 64, 2),
    ("dec4", 64, 64, 2),
)

OCParams = Dict[str, Dict[str, jnp.ndarray]]


def oc_init(key: jax.Array, bn_std: float = 0.5) -> OCParams:
    """Sample a fresh OC parameter pytree (jit-safe; static shapes).

    conv kernel ~ Kaiming normal fan_in relu (std = sqrt(2 / (in*k*k)),
    torch nn.init.kaiming_normal_ default), conv bias = 0, BN gamma ~
    N(0, bn_std), BN beta = 0 (network/mynn.py:57-74).
    """
    params: OCParams = {}
    keys = jax.random.split(key, len(_LAYERS) * 2)
    for i, (name, cin, cout, _d) in enumerate(_LAYERS):
        kk, kb = keys[2 * i], keys[2 * i + 1]
        std = math.sqrt(2.0 / (cin * 9))
        params[name] = {
            "kernel": std * jax.random.normal(kk, (3, 3, cin, cout), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
            "bn_scale": bn_std * jax.random.normal(kb, (cout,), jnp.float32),
            "bn_bias": jnp.zeros((cout,), jnp.float32),
        }
    return params


def oc_maybe_resample(params: OCParams, gate: jax.Array, key: jax.Array,
                      bn_std: float = 0.5) -> OCParams:
    """Re-randomize all 16 OC modules when ``gate`` is set (deepv3.py:290-306)."""
    return jax.lax.cond(gate, lambda: oc_init(key, bn_std), lambda: params)


def _dilation(name: str) -> int:
    for n, _ci, _co, d in _LAYERS:
        if n == name:
            return d
    raise KeyError(name)


def _conv(p: Dict[str, jnp.ndarray], x: jnp.ndarray, dilation: int,
          dtype) -> jnp.ndarray:
    d = (dilation, dilation)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype),
        window_strides=(1, 1), padding=[d, d], rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(y.dtype)


# Remat everything except the per-channel stats: without this, XLA keeps the
# fp32 normalized maps (and fp32 cotangent zero-fills at the lax.cond
# boundaries) live across the whole backward pass — ~5 GB of HBM at bs8 768^2
# for the enc4/dec1-sized maps. Recomputing the elementwise normalize from
# the (already-saved) bf16 conv output is a fused no-extra-pass operation;
# only the stat reductions are worth saving.
_BN_POLICY = jax.checkpoint_policies.save_only_these_names("oc_bn_stats")


@functools.partial(jax.checkpoint, policy=_BN_POLICY)
def _bn_relu(p: Dict[str, jnp.ndarray], y: jnp.ndarray) -> jnp.ndarray:
    """Train-mode BN (batch stats, biased var, eps 1e-5) then ReLU, fp32 math."""
    yf = y.astype(jnp.float32)
    mean = checkpoint_name(jnp.mean(yf, axis=(0, 1, 2)), "oc_bn_stats")
    var = checkpoint_name(
        jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean),
        "oc_bn_stats")
    yf = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
    yf = yf * p["bn_scale"] + p["bn_bias"]
    return jnp.maximum(yf, 0.0).astype(y.dtype)


def _stage(p, x, name: str, dtype,
           scale: Optional[Tuple[float, float]] = None,
           size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """relu(bn(resize(conv(x)))) — the reference's per-layer pattern."""
    y = _conv(p[name], x, _dilation(name), dtype)
    y = resize_nearest(y, size=size, scale=scale, impl="fused")
    return _bn_relu(p[name], y)


def oc_encode(params: OCParams, xp: jnp.ndarray, hw: Tuple[int, int],
              scales_enc: Tuple[float, ...] = (1.205, 1.2, 1.2),
              dtype=jnp.float32) -> jnp.ndarray:
    """Encoder half: stem features -> OCout_dec (N, int(H/2), int(W/2), 256),
    the overcomplete bottleneck injected into the decoder (p3 gate)."""
    h, w = hw
    half = (int(h / 2), int(w / 2))
    s = [(se, se) for se in scales_enc]
    x = _stage(params, xp, "enc1", dtype, scale=s[0])
    x = _stage(params, x, "enc2", dtype, scale=s[1])
    x = _stage(params, x, "enc3", dtype, scale=s[2])
    return _stage(params, x, "enc4", dtype, size=half)


def oc_decode(params: OCParams, oc_dec: jnp.ndarray, hw: Tuple[int, int],
              scales_dec: Tuple[float, ...] = (0.838, 0.798),
              dtype=jnp.float32) -> jnp.ndarray:
    """Decoder half: OCout_dec -> OCout (N, ceil(H/4), ceil(W/4), 64), the
    map added onto the stem features (p gate)."""
    h, w = hw
    half = (int(h / 2), int(w / 2))
    quarter = (math.ceil(h / 4), math.ceil(w / 4))
    d = [(sd, sd) for sd in scales_dec]
    x = _stage(params, oc_dec, "dec1", dtype, size=half)
    x = _stage(params, x, "dec2", dtype, scale=d[0])
    x = _stage(params, x, "dec3", dtype, scale=d[1])
    return _stage(params, x, "dec4", dtype, size=quarter)


def oc_apply(params: OCParams, xp: jnp.ndarray, hw: Tuple[int, int],
             scales_enc: Tuple[float, ...] = (1.205, 1.2, 1.2),
             scales_dec: Tuple[float, ...] = (0.838, 0.798),
             dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the full OC branch on stem features ``xp`` (N, ~H/4, ~W/4, 64).

    Returns (OCout, OCout_dec):
      OCout     (N, ceil(H/4), ceil(W/4), 64) — added to stem features (p gate)
      OCout_dec (N, int(H/2), int(W/2), 256)  — decoder injection (p3 gate)
    where (H, W) = ``hw`` is the *network input* size (deepv3.py:285-286).
    """
    oc_dec = oc_encode(params, xp, hw, scales_enc, dtype)
    x = oc_decode(params, oc_dec, hw, scales_dec, dtype)
    return x, oc_dec
