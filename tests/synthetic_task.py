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
# Domain-generalization variant — a CUE-CONFLICT task (the shortcut-learning
# protocol of the DG literature): every class carries a TEXTURE (the
# style-invariant cue, present in both domains) and, in most SOURCE images,
# a class-correlated INK HUE (hue k/19 for class k) — an easy spurious
# shortcut. A fraction ``p_scramble`` of source images draw random ink hues
# instead, so texture is the only cue that explains the whole training set.
# In the TARGET domain ink hues are ALWAYS random (color is uninformative —
# deliberately not misleading, see below) and the paper/background style
# shifts warm/bright -> cool/dim (plain covariate shift on top).
#
# Why this shape: a model free to exploit absolute channel statistics rides
# the color shortcut and collapses on target, while MRFP+'s feature-
# statistic perturbations (NP+ rescales per-channel stats by alpha ~
# N(1, 0.75), perturb/np_plus.py; the OC branch re-randomizes multi-
# resolution features, deepv3.py:280-367) corrupt exactly the color-
# identity channel during training and force weight onto texture. This is
# the sim-to-real protocol of the paper (train GTAV, eval Cityscapes,
# reference main.py:813-913) compressed into a sandbox-sized executable
# experiment with a CONTROLLED shortcut.
#
# Designs calibrated and rejected first (see CLAUDE.md round-3 notes):
# pure covariate shift — mild (target paper_v 0.55-0.80) OR severe (2.5x
# darker, half contrast) — leaves the plain baseline fully robust (target
# mIoU 0.44 / 0.47 vs source 0.47: texture features are inherently
# photometric-stable), and a PERFECT source shortcut whose hue wheel
# rotates by 7/19 in target (misleading, not just uninformative) floors
# both arms (0.087 vs 0.059): with p_scramble=0 even the perturbed model
# rides the shortcut, and a hue derangement is not a per-channel affine
# map, so it sits outside the perturbations' invariance family.
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


# Per-domain photometric style. ``p_scramble`` is the probability that an
# image's class->ink-hue LUT is replaced by 19 uniform-random hues: 0.25 in
# source (color is an easy but INCOMPLETE shortcut; texture explains all
# images), 1.0 in target (color is pure noise). The paper (background)
# style shifts warm/bright -> cool/dim, and ink stays darker than paper in
# both domains so the texture polarity is preserved. Both styles draw the
# SAME number of rng values, so equal seeds produce identical class
# layouts across domains.
DG_STYLES = {
    "source": dict(p_scramble=0.25, paper_hue=(0.00, 0.17),
                   paper_s=(0.10, 0.40), paper_v=(0.75, 0.95),
                   ink_s=(0.30, 0.80), ink_v=(0.10, 0.35)),
    "target": dict(p_scramble=1.0, paper_hue=(0.50, 0.83),
                   paper_s=(0.30, 0.70), paper_v=(0.55, 0.80),
                   ink_s=(0.10, 0.50), ink_v=(0.25, 0.45)),
}


def _dg_sample(rng: np.random.Generator, hw: int, block: int, style: dict):
    g = hw // block
    classes = rng.integers(0, 19, (g, g))
    label = np.repeat(np.repeat(classes, block, 0), block, 1).astype(np.uint8)
    ink = _texture_mask(label.astype(np.int64), hw)

    def draw(lo, hi, size=None):
        return rng.uniform(lo, hi, size)

    paper = _hsv_to_rgb(np.full((), draw(*style["paper_hue"])),
                        draw(*style["paper_s"]),
                        draw(*style["paper_v"])).astype(np.int16)
    # class->hue LUT (hue k/19 + jitter), or 19 random hues when scrambled;
    # both branches consume identical rng draws (seed-stable class layouts)
    rand_hue = draw(0.0, 1.0, 19)
    lut_hue = (np.arange(19) / 19.0 + draw(-0.015, 0.015, 19)) % 1.0
    scrambled = draw(0.0, 1.0) < style["p_scramble"]
    hue = rand_hue if scrambled else lut_hue
    ink_lut = _hsv_to_rgb(hue, draw(*style["ink_s"], 19),
                          draw(*style["ink_v"], 19)).astype(np.int16)
    img = np.where(ink[..., None], ink_lut[label], paper)
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
