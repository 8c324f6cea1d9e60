"""Data layer: on-disk MNIST/CIFAR-10 readers, synthetic fallback,
torchvision-parity augmentation, batching."""
from .datasets import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    Dataset,
    augment_batch,
    batch_iterator,
    inf_generator,
    load_cifar10,
    load_digits_dataset,
    load_mnist,
    load_svhn,
    synthetic_dataset,
    train_val_split,
)
from .download import download_dataset
from .prefetch import prefetch_to_device

__all__ = [
    "download_dataset",
    "prefetch_to_device",
    "CIFAR10_MEAN",
    "CIFAR10_STD",
    "Dataset",
    "augment_batch",
    "batch_iterator",
    "inf_generator",
    "load_cifar10",
    "load_digits_dataset",
    "load_mnist",
    "load_svhn",
    "synthetic_dataset",
    "train_val_split",
]
