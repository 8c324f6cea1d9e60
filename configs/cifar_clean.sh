#!/bin/sh
# Config 3: CIFAR-10 premetanode10 standalone 8-step RK2, clean training
python -m neural_ode_metasolver_tpu.runners.cifar_runner \
    --network premetanode10 --solvers "rk2,u,8,-1,0.5,-1" \
    --adv_training_mode clean --nepochs 36 \
    --save_dir ./experiment_cifar_clean "$@"
