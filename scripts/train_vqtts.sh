#!/bin/bash
# End-to-end VQ-TTS training (the invocation the reference's train_vqvae.sh
# currently runs, reference scripts/train_vqvae.sh:10-17: batch 1, ckpt 1000).
python train.py \
    --model vqtts \
    --dataset ljspeech \
    --log_dir ./logs/vqtts \
    --batch_size 1 \
    --ckpt_every_n_steps 1000 \
    --eval_every_n_epochs 5 \
    "$@"
