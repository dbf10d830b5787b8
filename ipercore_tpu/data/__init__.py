"""Datasets and input pipelines.

Factory parity with `iPERCore/data/dataset.py:9-43` (DatasetFactory).
"""

from ipercore_tpu.data.datasets import (
    DATASET_REGISTRY,
    ProcessedVideoDataset,
    PersonalizedDataset,
    BackgroundDataset,
    VideoBackgroundDataset,
    build_dataset,
)
