from mrfp_tpu.data import label_maps, transforms
from mrfp_tpu.data.datasets import (
    DATASETS,
    TRAIN_SPLITS,
    VAL_SPLITS,
    BDD100k,
    Cityscapes,
    FoggyCityscapes,
    GTAV,
    Mapillary,
    RainyCityscapes,
    Synthia,
    SyntheticDataset,
)
from mrfp_tpu.data.loader import DataLoader, prefetch_to_device

__all__ = [
    "label_maps", "transforms",
    "DATASETS", "TRAIN_SPLITS", "VAL_SPLITS",
    "BDD100k", "Cityscapes", "FoggyCityscapes", "GTAV", "Mapillary",
    "RainyCityscapes", "Synthia", "SyntheticDataset",
    "DataLoader", "prefetch_to_device",
]
