from .datasets import load_dataset, DatasetSplit, CIFAR10_MEAN, CIFAR10_STD
from .loader import DataLoader, get_data_loaders
from .codes import CodesDataset, VanillaCodesDataset, get_code_loaders

__all__ = [
    "load_dataset",
    "DatasetSplit",
    "CIFAR10_MEAN",
    "CIFAR10_STD",
    "DataLoader",
    "get_data_loaders",
    "CodesDataset",
    "VanillaCodesDataset",
    "get_code_loaders",
]
