"""Frequency-domain image transforms: HPF / LPF / PHOT (dataloaders.py:24-79).

The reference implements these as numpy dataset transforms (available but
commented out of the active pipelines). Here they are pure jnp functions that
run on device inside the jit'd preprocessing path (jnp.fft lowers to XLA's
FFT on TPU), with the same math:

- HPF: zero a radius-16 disk at the centered spectrum (high-pass), inverse
  FFT, keep the real signal as float (the reference casts the complex array
  to float32, which numpy resolves to the real part).
- LPF: complement mask (low-pass).
- PHOT: phase-only transform — ifftn(fft / |fft|) * 5 * 255.

All operate on HWC float images; fftn over all three axes like np.fft.fftn.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dist2(h: int, w: int) -> jnp.ndarray:
    """Squared distance from the centered spectrum origin."""
    cy, cx = h // 2, w // 2
    y = jnp.arange(h)[:, None]
    x = jnp.arange(w)[None, :]
    return (y - cy) ** 2 + (x - cx) ** 2


def hpf(img: jnp.ndarray, radius: int = 16) -> jnp.ndarray:
    """High-pass filter an HWC image: zero dist^2 <= r^2 (dataloaders.py:38-39)."""
    h, w = img.shape[0], img.shape[1]
    f = jnp.fft.fftshift(jnp.fft.fftn(img))
    mask = jnp.where(_dist2(h, w) <= radius * radius, 0.0, 1.0)[:, :, None]
    out = jnp.fft.ifftn(jnp.fft.ifftshift(f * mask))
    return jnp.real(out).astype(jnp.float32)


def lpf(img: jnp.ndarray, radius: int = 16) -> jnp.ndarray:
    """Low-pass filter an HWC image: zero dist^2 >= r^2 (dataloaders.py:72-73).
    NOTE the asymmetry with hpf — the reference drops the ring exactly at
    r^2 from BOTH filters."""
    h, w = img.shape[0], img.shape[1]
    f = jnp.fft.fftshift(jnp.fft.fftn(img))
    mask = jnp.where(_dist2(h, w) < radius * radius, 1.0, 0.0)[:, :, None]
    out = jnp.fft.ifftn(jnp.fft.ifftshift(f * mask))
    return jnp.real(out).astype(jnp.float32)


def phot(img: jnp.ndarray) -> jnp.ndarray:
    """Phase-only transform (amplitude removal), dataloaders.py:47-56."""
    f = jnp.fft.fftn(img)
    out = jnp.fft.ifftn(f / jnp.abs(f))
    return jnp.real(out * 5 * 255).astype(jnp.float32)


def apply_freq_transform(images: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Batched on-device frequency transform for NHWC image batches —
    the in-graph equivalent of putting HPF/LPF/PHOT in the data pipeline
    (BASELINE.json config 2: FFT amplitude-perturbation train step)."""
    import jax

    fn = {"hpf": hpf, "lpf": lpf, "phot": phot}[kind]
    return jax.vmap(fn)(images)
