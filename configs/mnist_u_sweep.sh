#!/bin/sh
# Config 2: MNIST robust-accuracy-vs-u sweep (README.md:46-50 figure)
python -m neural_ode_metasolver_tpu.runners.u_sweep \
    --u_grid 0.1,0.2,0.3,0.4,0.5,0.6667,0.8,0.9,1.0 \
    --seeds 1,2,3,4,5,6,7,8,9 --n_steps 8 --nepochs 40 \
    --eps 0.3 --pgd_lr 0.00784313725490196 --pgd_niter 7 \
    --output_csv mnist_u_sweep.csv "$@"
