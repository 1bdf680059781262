#!/bin/bash
# Canonical VQ-VAE training invocation (counterpart of reference
# scripts/train_vqvae.sh). Trains the waveform codec on LJSpeech.
python train.py \
    --model vqvae \
    --dataset ljspeech \
    --log_dir ./logs/vqvae \
    --batch_size 8 \
    --ckpt_every_n_steps 2500 \
    --eval_every_n_epochs 5 \
    "$@"
