#!/bin/bash
# LM-over-VQ-codes training (reference scripts/train_transformer_lm.sh:
# batch 8, ckpt every 2500).
python train.py \
    --model transformer_lm \
    --dataset vqlatent \
    --log_dir ./logs/transformer_lm \
    --batch_size 8 \
    --ckpt_every_n_steps 2500 \
    --eval_every_n_epochs 5 \
    "$@"
