from .datasets import (
    BatchLoader,
    Cifar10Dataset,
    GaussianDataset,
    ImageFolderDataset,
    LatentDataset,
    LatentWithPixelDataset,
    center_crop_arr,
    load_dataset,
    random_crop_arr,
)
from .pipeline import prefetch_to_device

__all__ = [
    "BatchLoader", "Cifar10Dataset", "GaussianDataset", "ImageFolderDataset",
    "LatentDataset", "LatentWithPixelDataset", "center_crop_arr",
    "random_crop_arr", "load_dataset", "prefetch_to_device",
]
