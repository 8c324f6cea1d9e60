"""CLIs with reference flag parity: MNIST trainer, CIFAR train+attack,
robust-accuracy sweep."""
