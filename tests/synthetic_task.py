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
