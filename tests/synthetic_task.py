"""Procedurally generated GTAV-format segmentation task with learnable
structure: block-partitioned images where each block's COLOR determines its
class (one well-separated palette color per trainId, plus per-pixel noise).

A model that learns the color->class mapping scores ~1.0 mIoU; an untrained
one scores ~1/19. Written as a real on-disk GTAV tree (images/<split>/*.png,
labels/<split>/*.png with raw GTAV label ids) so the genuine cli.train ->
Orbax checkpoint -> cli.eval loop (reference main.py:844-871,876-913) can be
exercised end-to-end without any dataset download.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from mrfp_tpu.data.label_maps import GTAV_VALID

# 19 well-separated RGB anchors (max/mid/min channel combos); noise +-12
# keeps nearest-palette classification unambiguous (min pairwise distance
# ~90) even through bilinear resampling at block borders.
PALETTE = np.array([
    [230, 25, 25], [25, 230, 25], [25, 25, 230], [230, 230, 25],
    [230, 25, 230], [25, 230, 230], [230, 128, 25], [128, 25, 230],
    [25, 128, 128], [128, 128, 25], [230, 230, 128], [128, 230, 230],
    [230, 128, 128], [60, 60, 60], [200, 200, 200], [128, 25, 25],
    [25, 128, 25], [25, 25, 128], [128, 128, 230]], np.uint8)
assert len(PALETTE) == 19


def _sample(rng: np.random.Generator, hw: int, block: int):
    """One (image, trainId-label) pair: a block grid of palette colors."""
    g = hw // block
    classes = rng.integers(0, 19, (g, g))
    label = np.repeat(np.repeat(classes, block, 0), block, 1).astype(np.uint8)
    img = PALETTE[label].astype(np.int16)
    img = img + rng.integers(-12, 13, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), label


def build_gtav_tree(root: str, n_train: int = 48, n_val: int = 6,
                    hw: int = 128, block: int = 32, seed: int = 0) -> str:
    """Write the tree; returns ``root``. Labels carry RAW GTAV ids
    (GTAV_VALID[trainId]) so data.label_maps.encode_gtav round-trips them."""
    to_raw = np.asarray(GTAV_VALID, np.uint8)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("test", n_val)):
        os.makedirs(os.path.join(root, "images", split), exist_ok=True)
        os.makedirs(os.path.join(root, "labels", split), exist_ok=True)
        for i in range(n):
            img, label = _sample(rng, hw, block)
            Image.fromarray(img).save(
                os.path.join(root, "images", split, f"{i:05d}.png"))
            Image.fromarray(to_raw[label]).save(
                os.path.join(root, "labels", split, f"{i:05d}.png"))
    return root


# --------------------------------------------------------------------------
# Domain-generalization variant: class = TEXTURE (style-invariant cue),
# per-image ink/paper colors drawn from a DOMAIN-specific photometric
# distribution. Train on the "source" style, evaluate zero-shot on the
# "target" style — the sim-to-real protocol of the paper (train GTAV, eval
# Cityscapes, reference main.py:813-913) compressed into a sandbox-sized
# executable experiment. Texture cues survive any global color shift;
# a model that latches onto absolute channel statistics does not.
# --------------------------------------------------------------------------

def _texture_mask(cls: np.ndarray, hw: int) -> np.ndarray:
    """Binary ink mask per pixel given the per-pixel class map ``cls``.

    19 textures, all color-free and local (recognisable inside a small
    receptive field): 12 oriented gratings (6 angles x 2 periods), wide
    gratings, checkers, dot lattices of two spacings — no two classes share
    (orientation, frequency) structure."""
    y, x = np.mgrid[0:hw, 0:hw].astype(np.float32)
    masks = np.empty((19, hw, hw), np.bool_)
    k = 0
    for period in (6.0, 12.0):
        for j in range(6):
            th = np.pi * j / 6.0
            phase = x * np.cos(th) + y * np.sin(th)
            masks[k] = np.floor(phase / period) % 2 == 0
            k += 1
    for period in (24.0,):
        for th in (0.0, np.pi / 2):
            phase = x * np.cos(th) + y * np.sin(th)
            masks[k] = np.floor(phase / period) % 2 == 0
            k += 1
    for s in (4, 10, 20):
        masks[k] = ((np.floor(x / s) + np.floor(y / s)) % 2) == 0
        k += 1
    for sp, r2 in ((8, 7.0), (14, 22.0)):
        masks[k] = ((x % sp) - sp / 2) ** 2 + ((y % sp) - sp / 2) ** 2 < r2
        k += 1
    assert k == 19
    return np.take_along_axis(masks, cls[None], axis=0)[0]


def _hsv_to_rgb(h, s, v):
    """Vectorized HSV->RGB, float in [0,1] -> uint8 arrays of shape h.shape+(3,)."""
    i = np.floor(h * 6.0).astype(int) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    lut = np.stack([np.stack(c, -1) for c in
                    ((v, t, p), (q, v, p), (p, v, t),
                     (p, q, v), (t, p, v), (v, p, q))])
    rgb = np.take_along_axis(lut, i[None, ..., None], axis=0)[0]
    return np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8)


# per-domain photometric style: (hue range, paper sat/val, ink sat/val).
# Source is warm bright-paper/dark-ink; target is cool, dimmer paper and
# lighter ink — a large shift in every channel statistic while keeping the
# ink-darker-than-paper polarity (so the texture cue itself is preserved).
DG_STYLES = {
    "source": dict(hue=(0.00, 0.17), paper_s=(0.10, 0.40),
                   paper_v=(0.75, 0.95), ink_s=(0.30, 0.80),
                   ink_v=(0.10, 0.35)),
    "target": dict(hue=(0.50, 0.83), paper_s=(0.30, 0.70),
                   paper_v=(0.55, 0.80), ink_s=(0.10, 0.50),
                   ink_v=(0.25, 0.45)),
}


def _dg_sample(rng: np.random.Generator, hw: int, block: int, style: dict):
    g = hw // block
    classes = rng.integers(0, 19, (g, g))
    label = np.repeat(np.repeat(classes, block, 0), block, 1).astype(np.uint8)
    ink = _texture_mask(label.astype(np.int64), hw)

    def draw(lo, hi):
        return rng.uniform(lo, hi)

    h = draw(*style["hue"])
    paper = _hsv_to_rgb(np.full((), h), draw(*style["paper_s"]),
                        draw(*style["paper_v"])).astype(np.int16)
    ink_c = _hsv_to_rgb(np.full((), (h + rng.uniform(-0.05, 0.05)) % 1.0),
                        draw(*style["ink_s"]),
                        draw(*style["ink_v"])).astype(np.int16)
    img = np.where(ink[..., None], ink_c, paper)
    img = img + rng.integers(-8, 9, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), label


def build_dg_tree(root: str, domain: str, n_train: int = 48, n_val: int = 8,
                  hw: int = 256, block: int = 64, seed: int = 0) -> str:
    """GTAV-format tree whose images are textured in the given domain style
    ('source'/'target'). Same label/texture distribution across domains —
    only the photometric style differs."""
    style = DG_STYLES[domain]
    to_raw = np.asarray(GTAV_VALID, np.uint8)
    rng = np.random.default_rng(seed + (0 if domain == "source" else 10_000))
    for split, n in (("train", n_train), ("test", n_val)):
        os.makedirs(os.path.join(root, "images", split), exist_ok=True)
        os.makedirs(os.path.join(root, "labels", split), exist_ok=True)
        for i in range(n):
            img, label = _dg_sample(rng, hw, block, style)
            Image.fromarray(img).save(
                os.path.join(root, "images", split, f"{i:05d}.png"))
            Image.fromarray(to_raw[label]).save(
                os.path.join(root, "labels", split, f"{i:05d}.png"))
    return root
