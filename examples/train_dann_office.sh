#!/bin/bash
# Reference: /root/reference/README.md:48 —
#   python3 main.py ... --src_data dslr --tgt_data webcam --lr 0.001 --bs 28
exec python -m alignq_tpu.train.cli_da \
    --task dann --arch resnet50 --method ours --bitW 8 --abitW 8 --admm \
    --src_data dslr --tgt_data webcam --lr 0.001 \
    --train_batch_size 28 --eval_batch_size 28 --num_epochs 200 \
    --weight_decay 5e-4 \
    --data_dir "${DATA_DIR:-/root/data}" --job_dir "${JOB_DIR:-/tmp/alignq_dann}" "$@"
