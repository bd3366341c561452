"""Label-map parity vs the reference algorithms (main.py:106-112,560-564,
742-745), implemented directly as oracles here."""

import numpy as np

from mrfp_tpu.data import label_maps as lm


def _reference_sequential(mask, void, valid, ignore=255):
    """encode_segmap: sequential in-place substitution (main.py:106-112)."""
    mask = mask.copy()
    class_map = dict(zip(valid, range(19)))
    for v in void:
        mask[mask == v] = ignore
    for v in valid:
        mask[mask == v] = class_map[v]
    return mask


def test_cityscapes_lut_matches_sequential():
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 35, (64, 64)).astype(np.uint8)
    ref = _reference_sequential(mask, lm.CITYSCAPES_VOID, lm.CITYSCAPES_VALID)
    np.testing.assert_array_equal(lm.encode_cityscapes(mask), ref)


def test_gtav_lut_matches_sequential():
    rng = np.random.default_rng(1)
    mask = rng.integers(0, 40, (64, 64)).astype(np.uint8)  # includes id 34 (void)
    ref = _reference_sequential(mask, lm.GTAV_VOID, lm.GTAV_VALID)
    np.testing.assert_array_equal(lm.encode_gtav(mask), ref)


def test_synthia_copy_remap():
    """SYNTHIA uses copy-from-original with 255 fill (main.py:560-564)."""
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 25, (32, 32)).astype(np.uint8)
    ref = np.full(raw.shape, 255, np.uint8)
    for k, v in lm.SYNTHIA_MAP.items():
        ref[raw == k] = v
    np.testing.assert_array_equal(lm.encode_synthia(raw), ref)


def test_mapillary_copy_remap():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 66, (32, 32)).astype(np.uint8)
    ref = np.full(raw.shape, 255, np.uint8)
    for k, v in lm.MAPILLARY_MAP.items():
        ref[raw == k] = v
    np.testing.assert_array_equal(lm.encode_mapillary(raw), ref)


def test_all_19_classes_covered():
    assert sorted(lm.MAPILLARY_MAP.values()) != []
    assert set(lm.SYNTHIA_MAP.values()) == set(range(19))
    assert set(lm.MAPILLARY_MAP.values()) == set(range(19))
    lut = lm.sequential_lut(lm.CITYSCAPES_VOID, lm.CITYSCAPES_VALID)
    assert set(lut[np.array(lm.CITYSCAPES_VALID)]) == set(range(19))
    assert all(lut[v] == 255 for v in lm.CITYSCAPES_VOID if 0 <= v < 256)


def test_decode_segmap_roundtrip():
    lbl = np.array([[0, 10, 18], [255, 5, 13]], dtype=np.uint8)
    rgb = lm.decode_segmap(lbl)
    assert rgb.shape == (2, 3, 3)
    assert (rgb[1, 0] == 0).all()  # ignore -> black
    assert (rgb[0, 0] == lm.CITYSCAPES_PALETTE[0]).all()
