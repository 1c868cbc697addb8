"""Data: in-memory datasets, host batching, on-device augmentation."""

from .augment import (
    color_jitter,
    make_eval_transform,
    make_train_augment,
    normalize,
    random_erasing,
    random_hflip,
    random_resized_crop,
)
from .datasets import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    Dataset,
    batch_at,
    epoch_batches,
    epoch_index_plan,
    filter_by_class,
    load_cifar10,
    load_image_folder,
    load_tiny_imagenet,
    synthetic_dataset,
)
from .grain_adapter import grain_epoch_batches, have_grain
from .pipeline import prefetch_to_device

__all__ = [
    "prefetch_to_device",
    "grain_epoch_batches",
    "have_grain",
    "epoch_index_plan",
    "batch_at",
    "color_jitter",
    "make_eval_transform",
    "make_train_augment",
    "normalize",
    "random_erasing",
    "random_hflip",
    "random_resized_crop",
    "CIFAR10_MEAN",
    "CIFAR10_STD",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "Dataset",
    "epoch_batches",
    "filter_by_class",
    "load_cifar10",
    "load_image_folder",
    "load_tiny_imagenet",
    "synthetic_dataset",
]
