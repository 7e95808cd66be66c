"""Datasets, synthetic scenes, point-cloud and config I/O."""

from . import config, dataset, ply, synthetic
from .config import SlamConfig, load_config
from .dataset import ICLDataset, SevenScenesDataset, make_dataset
from .synthetic import SyntheticDataset

__all__ = [
    "config",
    "dataset",
    "ply",
    "synthetic",
    "SlamConfig",
    "load_config",
    "ICLDataset",
    "SevenScenesDataset",
    "SyntheticDataset",
    "make_dataset",
]
