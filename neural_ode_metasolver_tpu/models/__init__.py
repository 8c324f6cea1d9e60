"""Model zoo: MNIST MetaNODE and the CIFAR-10 metanode/premetanode family."""
from . import nn
from .odenet_mnist import MnistConfig, apply_mnist, init_mnist
from .torch_import import (
    cifar_params_from_torch_state_dict,
    mnist_params_from_torch_state_dict,
)
from .torch_export import (
    cifar_state_dict_from_params,
    mnist_state_dict_from_params,
    reference_wandb_config,
    save_cifar_reference_checkpoint,
    save_mnist_reference_checkpoint,
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
    "cifar_state_dict_from_params",
    "mnist_state_dict_from_params",
    "reference_wandb_config",
    "save_cifar_reference_checkpoint",
    "save_mnist_reference_checkpoint",
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
