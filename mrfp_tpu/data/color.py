"""Bit-exact numpy reimplementation of PIL's RGB<->HSV conversions.

The reference's ColorJitter hue op (dataloaders.py:618-637) is PIL
``convert("HSV")`` -> shift H with uint8 wraparound -> ``convert("RGB")``.
PIL's per-pixel C conversion costs ~125 ms on a GTAV-sized image — the
dominant term left in the host augmentation pipeline (CLAUDE.md input
numbers). These vectorized versions reproduce Pillow's Convert.c
*bit-exactly* — verified exhaustively over all 16.7M RGB (and all 16.7M
HSV) inputs in tests/test_transforms.py (sampled) and offline (full).

The floating-point subtleties that matter (empirically derived against the
Pillow oracle; each narrowing below flips real pixels if done wrong):

- rgb2hsv: rc/gc/bc are C floats, but ``h = 2.0 + rc - bc`` mixes double
  literals, so the hue expression evaluates in DOUBLE and narrows to f32
  once on assignment; the ``fmod(h/6.0 + 1.0, 1.0)`` step is double,
  narrowed to f32 again, and the final ``(int)(h * 255.0)`` truncates the
  double product.
- hsv2rgb: ``f`` and ``fs`` are f32-narrowed doubles; p/q/t round
  ``v * (1.0 - ...)`` in double.
"""

from __future__ import annotations

import numpy as np

_f32, _f64 = np.float32, np.float64


def rgb_to_hsv_u8(rgb: np.ndarray) -> np.ndarray:
    """uint8 (..., 3) RGB -> uint8 (..., 3) HSV, identical to
    ``Image.convert("HSV")`` (Pillow Convert.c rgb2hsv) for every input."""
    r = rgb[..., 0].astype(_f32)
    g = rgb[..., 1].astype(_f32)
    b = rgb[..., 2].astype(_f32)
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    v = maxc.astype(np.uint8)
    cr = (maxc - minc).astype(_f32)
    achromatic = cr == 0
    crs = np.where(achromatic, _f32(1), cr)
    rc = ((maxc - r) / crs).astype(_f32)
    gc = ((maxc - g) / crs).astype(_f32)
    bc = ((maxc - b) / crs).astype(_f32)
    s = (cr / np.where(maxc == 0, _f32(1), maxc)).astype(_f32)
    h = np.where(
        maxc == r, (bc - gc).astype(_f32),
        np.where(maxc == g,
                 (2.0 + rc.astype(_f64) - bc.astype(_f64)).astype(_f32),
                 (4.0 + gc.astype(_f64) - rc.astype(_f64)).astype(_f32)))
    h = np.fmod(h.astype(_f64) / 6.0 + 1.0, 1.0).astype(_f32)
    uh = np.clip(np.trunc(h.astype(_f64) * 255.0), 0, 255).astype(np.uint8)
    us = np.clip(np.trunc(s.astype(_f64) * 255.0), 0, 255).astype(np.uint8)
    uh = np.where(achromatic, np.uint8(0), uh)
    us = np.where(achromatic, np.uint8(0), us)
    return np.stack([uh, us, v], axis=-1)


def hsv_to_rgb_u8(hsv: np.ndarray) -> np.ndarray:
    """uint8 (..., 3) HSV -> uint8 (..., 3) RGB, identical to
    ``Image.merge("HSV", ...).convert("RGB")`` (Pillow hsv2rgb)."""
    h = hsv[..., 0].astype(_f64)
    s = hsv[..., 1].astype(_f64)
    v = hsv[..., 2].astype(_f64)
    fh = h * 6.0 / 255.0
    i = np.floor(fh).astype(np.int64)
    f = (fh - i).astype(_f32).astype(_f64)
    fs = (s / 255.0).astype(_f32).astype(_f64)
    p = np.clip(np.round(v * (1.0 - fs)), 0, 255).astype(np.uint8)
    q = np.clip(np.round(v * (1.0 - fs * f)), 0, 255).astype(np.uint8)
    t = np.clip(np.round(v * (1.0 - fs * (1.0 - f))), 0, 255).astype(np.uint8)
    vv = hsv[..., 2]
    im = i % 6
    r = np.choose(im, [vv, q, p, p, t, vv])
    g = np.choose(im, [t, vv, vv, q, p, p])
    b = np.choose(im, [p, p, t, vv, vv, q])
    gray = hsv[..., 1] == 0
    r = np.where(gray, vv, r)
    g = np.where(gray, vv, g)
    b = np.where(gray, vv, b)
    return np.stack([r, g, b], axis=-1)


def saturation_u8(rgb: np.ndarray, factor: float) -> np.ndarray:
    """Bit-exact ``ImageEnhance.Color(img).enhance(factor)`` for RGB uint8.

    PIL's path is convert("L") (ITU-R 601-2 integer: (R*19595 + G*38470 +
    B*7471 + 0x8000) >> 16), replicate to RGB, then Blend.c's
    ``trunc(f32(a) + f32(factor) * (f32(b) - f32(a)))`` clipped — f32, not
    f64 (an f64 blend mismatches ~0.5% of random factors; verified against
    the PIL oracle over all 65536 (a, b) pairs x 200 factors)."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    lum = ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(_f32)
    f = _f32(factor)
    out = np.trunc(lum[..., None] +
                   f * (rgb.astype(_f32) - lum[..., None])).astype(_f64)
    return np.clip(out, 0, 255).astype(np.uint8)


def hue_shift_u8(rgb: np.ndarray, delta: int) -> np.ndarray:
    """RGB -> HSV -> (H + delta) mod 256 -> RGB, the reference hue jitter
    (dataloaders.py:618-637) without PIL. ``delta`` is the uint8 hue step
    (the reference's ``np.uint8(factor * 255)``)."""
    hsv = rgb_to_hsv_u8(rgb)
    hsv[..., 0] += np.uint8(delta & 0xFF)    # uint8 wraparound is the point
    return hsv_to_rgb_u8(hsv)
