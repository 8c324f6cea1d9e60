#!/bin/sh
# Config 4 (FLAGSHIP): FGSM-random adversarial training with solver smoothing
# (eps=8/255, alpha=10/255, Normal sigma=0.0125 noise on u, cyclic LR
# triangular2 base 1e-7 max 0.1 step_size_up 3186, 36 epochs)
# Parity precision is f32 (reference apex O0). For ~2.8x faster production
# runs on TPU v5e add:
#   --precision bf16 --grad_clipping_threshold 1.0 \
#   --compiler_option xla_tpu_use_bundle_aware_cost_model_for_fusions=true \
#   --activation_resblock GeLUpoly --activation_odeblock GeLUpoly \
#   --activation_bn1 GeLUpoly
# GeLUpoly is the parity-grade fast exact GELU (same function to 3.4e-6,
# +21% step throughput); swap it for GeLUtanh for a further +27% if a 3e-4
# model change is acceptable. (See SCALING.md "erf-GELU tax",
# "Mixed-precision stability note", and the fusion-flag sweep.)
python -m neural_ode_metasolver_tpu.runners.cifar_runner \
    --network premetanode10 --solvers "rk2,u,8,-1,0.5,-1" \
    --adv_training_mode fgsm_random \
    --noise_type normal --noise_sigma 0.0125 --noise_prob 1.0 \
    --adv_testing_mode at \
    --nepochs 36 --save_dir ./experiment_cifar_smoothing "$@"
