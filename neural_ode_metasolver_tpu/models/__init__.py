"""Model zoo: MNIST MetaNODE and the CIFAR-10 metanode/premetanode family."""
from . import nn
from .odenet_mnist import MnistConfig, apply_mnist, init_mnist
from .torch_import import (
    cifar_params_from_torch_state_dict,
    mnist_params_from_torch_state_dict,
)
from .odenet_cifar10 import (
    CifarConfig,
    MODEL_REGISTRY,
    apply_cifar,
    init_cifar,
    metanode4,
    metanode6,
    metanode10,
    metanode18,
    metanode34,
    premetanode4,
    premetanode6,
    premetanode10,
    premetanode18,
    premetanode34,
)

__all__ = [
    "nn",
    "MnistConfig",
    "apply_mnist",
    "init_mnist",
    "cifar_params_from_torch_state_dict",
    "mnist_params_from_torch_state_dict",
    "CifarConfig",
    "MODEL_REGISTRY",
    "apply_cifar",
    "init_cifar",
    "metanode4",
    "metanode6",
    "metanode10",
    "metanode18",
    "metanode34",
    "premetanode4",
    "premetanode6",
    "premetanode10",
    "premetanode18",
    "premetanode34",
]
