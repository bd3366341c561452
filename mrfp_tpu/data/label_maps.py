"""Label-ID remapping tables for every dataset the reference supports.

Three distinct remap mechanisms exist in the reference and each is
reproduced exactly:

1. Sequential in-place (Cityscapes family + GTAV, main.py:106-112):
   void ids -> 255 first, then valid ids -> train ids IN LIST ORDER on the
   same array — later rules observe earlier writes (the aliasing quirk noted
   in SURVEY.md §7). Implemented as a precomputed 256-entry LUT derived by
   simulating the sequential algorithm on the identity table, which is
   equivalent because each rule is a pure value substitution.
2. Copy-from-original with 255 fill (SYNTHIA, main.py:560-564).
3. Copy-from-original with explicit 66->19 dict (Mapillary, main.py:635-726).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

IGNORE = 255

CITYSCAPES_VOID = [0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30, -1]
CITYSCAPES_VALID = [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27,
                    28, 31, 32, 33]
GTAV_VOID = [0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30, 34, -1]
GTAV_VALID = CITYSCAPES_VALID
BDD_VOID = [0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30, -1]
BDD_VALID = list(range(19))  # labels are pre-mapped *_train_id.png files

# SYNTHIA: raw id (column 0 of the PNG-FI label) -> train id (main.py:536-537)
SYNTHIA_VALID = [3, 4, 2, 21, 5, 7, 15, 9, 6, 16, 1, 10, 17, 8, 18, 19, 20, 12, 11]
SYNTHIA_MAP: Dict[int, int] = {v: i for i, v in enumerate(SYNTHIA_VALID)}

# Mapillary 66 -> 19 (main.py:642-726)
MAPILLARY_MAP: Dict[int, int] = {
    13: 0, 24: 0, 41: 0,          # road / lane marking / manhole
    2: 1, 15: 1,                   # curb / sidewalk
    17: 2,                         # building
    6: 3,                          # wall
    3: 4,                          # fence
    45: 5, 47: 5,                  # pole / utility pole
    48: 6,                         # traffic light
    50: 7,                         # traffic sign
    30: 8,                         # vegetation
    29: 9,                         # terrain
    27: 10,                        # sky
    19: 11,                        # person
    20: 12, 21: 12, 22: 12,        # riders
    55: 13,                        # car
    61: 14,                        # truck
    54: 15,                        # bus
    58: 16,                        # train (on rails)
    57: 17,                        # motorcycle
    52: 18,                        # bicycle
}

CLASS_NAMES = ['road', 'sidewalk', 'building', 'wall', 'fence', 'pole',
               'traffic_light', 'traffic_sign', 'vegetation', 'terrain',
               'sky', 'person', 'rider', 'car', 'truck', 'bus', 'train',
               'motorcycle', 'bicycle']

# trainId -> RGB palette (utils_main.py:28-63 decode_segmap colors)
CITYSCAPES_PALETTE = np.array([
    [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
    [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
    [107, 142, 35], [152, 251, 152], [0, 130, 180], [220, 20, 60],
    [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
    [0, 0, 230], [119, 11, 32]], dtype=np.uint8)


def sequential_lut(void: Sequence[int], valid: Sequence[int],
                   ignore: int = IGNORE) -> np.ndarray:
    """Simulate the reference's sequential in-place encode_segmap on the
    uint8 identity table, yielding an equivalent single-gather LUT."""
    lut = np.arange(256, dtype=np.int64)
    for v in void:
        if 0 <= v < 256:
            lut[lut == v] = ignore
    for i, v in enumerate(valid):
        lut[lut == v] = i
    return lut.astype(np.uint8)


_CITYSCAPES_LUT = sequential_lut(CITYSCAPES_VOID, CITYSCAPES_VALID)
_GTAV_LUT = sequential_lut(GTAV_VOID, GTAV_VALID)


def dict_lut(mapping: Dict[int, int], size: int = 256,
             default: int = IGNORE) -> np.ndarray:
    lut = np.full(size, default, dtype=np.uint8)
    for k, v in mapping.items():
        lut[k] = v
    return lut


_SYNTHIA_LUT = dict_lut(SYNTHIA_MAP)
_MAPILLARY_LUT = dict_lut(MAPILLARY_MAP)


def encode_cityscapes(mask: np.ndarray) -> np.ndarray:
    return _CITYSCAPES_LUT[mask]


def encode_gtav(mask: np.ndarray) -> np.ndarray:
    return _GTAV_LUT[mask]


def encode_synthia(mask: np.ndarray) -> np.ndarray:
    return _SYNTHIA_LUT[mask]


def encode_mapillary(mask: np.ndarray) -> np.ndarray:
    return _MAPILLARY_LUT[mask]


def encode_bdd(mask: np.ndarray) -> np.ndarray:
    """BDD labels ship pre-mapped; passthrough (main.py:465-471)."""
    return mask


ENCODERS = {
    "cityscapes": encode_cityscapes,
    "rainy_cityscapes": encode_cityscapes,
    "foggy_cityscapes": encode_cityscapes,
    "gtav": encode_gtav,
    "bdd100k": encode_bdd,
    "synthia": encode_synthia,
    "mapillary": encode_mapillary,
}


def get_cityscapes_labels() -> np.ndarray:
    """trainId->RGB palette array (utils_main.py:83-103)."""
    return CITYSCAPES_PALETTE.copy()


# Cityscapes label metadata (the commented Label table of
# utils_main.py:105-256): (name, id, trainId) for every labelId.
CITYSCAPES_LABELS = [
    ("unlabeled", 0, 255), ("ego vehicle", 1, 255),
    ("rectification border", 2, 255), ("out of roi", 3, 255),
    ("static", 4, 255), ("dynamic", 5, 255), ("ground", 6, 255),
    ("road", 7, 0), ("sidewalk", 8, 1), ("parking", 9, 255),
    ("rail track", 10, 255), ("building", 11, 2), ("wall", 12, 3),
    ("fence", 13, 4), ("guard rail", 14, 255), ("bridge", 15, 255),
    ("tunnel", 16, 255), ("pole", 17, 5), ("polegroup", 18, 255),
    ("traffic light", 19, 6), ("traffic sign", 20, 7),
    ("vegetation", 21, 8), ("terrain", 22, 9), ("sky", 23, 10),
    ("person", 24, 11), ("rider", 25, 12), ("car", 26, 13),
    ("truck", 27, 14), ("bus", 28, 15), ("caravan", 29, 255),
    ("trailer", 30, 255), ("train", 31, 16), ("motorcycle", 32, 17),
    ("bicycle", 33, 18),
]


def decode_segmap(label: np.ndarray) -> np.ndarray:
    """trainId (H,W) -> RGB uint8 (H,W,3); ignore -> black (utils_main.py:28-63)."""
    out = np.zeros((*label.shape, 3), dtype=np.uint8)
    valid = label < 19
    out[valid] = CITYSCAPES_PALETTE[label[valid]]
    return out
