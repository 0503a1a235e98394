#!/bin/bash
# Reference: cdf_alignment_admm/resnet-56-cifar-10 defaults (4-bit + ADMM,
# mu=0.2 rho=0.3 from utils/admm.py:19-20)
exec python -m alignq_tpu.train.cli \
    --target_model resnet56_quant --method ours --bitW 4 --abitW 4 --admm \
    --lr 0.04 --train_batch_size 128 --num_epochs 200 \
    --lr_decay_steps 80 120 \
    --dataset cifar10 --data_dir "${DATA_DIR:-/root/data}" \
    --job_dir "${JOB_DIR:-/tmp/alignq_r56_admm}" "$@"
