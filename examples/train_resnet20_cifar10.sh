#!/bin/bash
# Reference: /root/reference/README.md:30 —
#   python3 main.py --gpus 0 --method ours --bitW 8 --abitW 8 ...
# (defaults from cdf_alignment/resnet-20-cifar-10/utils/options.py:54-89)
exec python -m alignq_tpu.train.cli \
    --target_model resnet20_quant --method ours --bitW 8 --abitW 8 \
    --lr 0.04 --train_batch_size 128 --num_epochs 200 \
    --lr_decay_steps 80 120 --lr_gamma 0.1 \
    --dataset cifar10 --data_dir "${DATA_DIR:-/root/data}" \
    --job_dir "${JOB_DIR:-/tmp/alignq_r20}" "$@"
