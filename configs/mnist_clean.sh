#!/bin/sh
# Config 1: MNIST standalone RK2 clean training (reference runner_new defaults)
python -m neural_ode_metasolver_tpu.runners.mnist_runner \
    --solvers "rk2,u,8,-1,0.5,-1" --solver_mode standalone \
    --optim rmsprop --lr 0.001 --batch_size 128 --nepochs 160 \
    --save_dir ./experiment_mnist_clean "$@"
