#!/bin/sh
# Config 5: solver + model ensembling inference with robust-accuracy eval
python examples/cifar10_build_and_evaluate.py \
    --checkpoint ./experiment_cifar_smoothing/best_solver_0 "$@"
python -m neural_ode_metasolver_tpu.runners.attacks_runner \
    --checkpoints_glob "./experiment_cifar_smoothing/best_*" \
    --modes clean,fgsm,at --epsilons 0.03137254901960784 \
    --output_csv robust_accuracy.csv "$@"
