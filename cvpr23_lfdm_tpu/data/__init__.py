"""Data pipeline: specs, datasets, sampling, augmentation, loading."""

from cvpr23_lfdm_tpu.data.augment import ClipAugment
from cvpr23_lfdm_tpu.data.datasets import (
    DatasetRepeater,
    DMVideoDataset,
    LFAEPairDataset,
    PairedDataset,
)
from cvpr23_lfdm_tpu.data.loader import PrefetchLoader, collate
from cvpr23_lfdm_tpu.data.specs import SPECS, DatasetSpec, get_spec

__all__ = [
    "ClipAugment",
    "DatasetRepeater",
    "DMVideoDataset",
    "LFAEPairDataset",
    "PairedDataset",
    "PrefetchLoader",
    "collate",
    "SPECS",
    "DatasetSpec",
    "get_spec",
]
