"""Tokenizes a corpus into VQ latents with a trained VQ-VAE.

Rebuild of reference scripts/generate_vq_dataset.py:1-227. Output format is
byte-compatible with what the VQLatent dataset expects: one pickle per
utterance ({"x": waveform float32, "q": code list}) under <out>/{train,val}/
plus metadata.json {"compression_factor", "vocab_size"}
(reference generate_vq_dataset.py:216-221).

TPU-first: encode_and_quantize is ONE jitted function over bucketed batches
(the reference streams batches through the GPU then forks a
multiprocessing.Pool for pickling; here device dispatch is asynchronous and
overlaps with the host writing pickles).

Usage:
    python -m scripts.generate_vq_dataset --log_dir ./logs/vqvae \
        --ckpt_num 32500 --save_path ./data/VQ-Latent
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import pickle
from collections import Counter

import numpy as np

from speech_masters_thesis_tpu.utils.logging_config import setup_logging

setup_logging()  # honors ./logger.conf / $SMT_LOGGER_CONF (reference parity)
logger = logging.getLogger("generate_vq_dataset")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log_dir", required=True, type=str)
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a JAX backend (e.g. 'cpu'); default: auto")
    parser.add_argument("--ckpt_num", required=True, type=str)
    parser.add_argument("--save_path", required=True, type=str)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--bucket_multiple", type=int, default=65536,
                        help="Audio length bucket granularity: larger = fewer "
                             "distinct shapes = fewer XLA compiles for full clips")
    parser.add_argument("--sanity", default=True, action="store_true",
                        help="Write a round-trip decoded sanity wav + token histogram")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from speech_masters_thesis_tpu.models.vqvae.model import VQVAE, compression_factor
    from speech_masters_thesis_tpu.ops.basic import sequence_mask
    from speech_masters_thesis_tpu.train.checkpoint import ckpt_dir
    from speech_masters_thesis_tpu.train.harness import get_dataloaders, get_model
    from speech_masters_thesis_tpu.utils.audio_io import save_wav
    from speech_masters_thesis_tpu.utils.config import load_config

    import orbax.checkpoint as ocp

    # Load the training-time config (single source of truth) and checkpoint
    config = load_config(os.path.join(args.log_dir, "config.yaml"))
    config.dataset.segment_length = -1  # full clips (reference :141-144)
    config.train.batch_size = args.batch_size

    model = get_model(config)
    assert isinstance(model, VQVAE), "generate_vq_dataset expects a VQVAE checkpoint"
    payload = ocp.PyTreeCheckpointer().restore(ckpt_dir(args.log_dir, args.ckpt_num))
    variables = {"params": payload["state"]["params"], **payload["state"]["model_state"]}

    factor = compression_factor(config)

    @jax.jit
    def encode_batch(audio, audio_len):
        mask = sequence_mask(audio_len, audio.shape[-1])
        codes, code_mask = model.apply(variables, audio, mask, method=VQVAE.encode)
        return codes, code_mask

    @jax.jit
    def decode_codes(codes):
        return model.apply(variables, codes, method=VQVAE.decode)

    train_loader, val_loader = get_dataloaders(config)
    train_loader.shuffle = False
    for loader in (train_loader, val_loader):
        loader.collate_kwargs = {"audio_multiple": args.bucket_multiple}

    os.makedirs(args.save_path, exist_ok=True)
    token_counts: Counter = Counter()
    sanity_done = False

    for split, loader in [("train", train_loader), ("val", val_loader)]:
        out_dir = os.path.join(args.save_path, split)
        os.makedirs(out_dir, exist_ok=True)
        idx = 0
        for batch in loader:
            audio, audio_len = batch["audio"], batch["audio_len"]
            codes, _ = encode_batch(jnp.asarray(audio), jnp.asarray(audio_len))
            codes = np.asarray(codes)
            for b in range(audio.shape[0]):
                n = int(audio_len[b])
                q = codes[b, :n // factor].astype(np.int64).tolist()
                token_counts.update(q)
                with open(os.path.join(out_dir, f"{split}_{idx:06d}.pkl"), "wb") as f:
                    pickle.dump({"x": np.asarray(audio[b, :n], np.float32), "q": q}, f)
                idx += 1
            if args.sanity and not sanity_done:
                recon = np.asarray(decode_codes(jnp.asarray(codes)))[0]
                save_wav(os.path.join(args.save_path, "sanity.wav"),
                         recon, config.dataset.sample_rate)
                sanity_done = True
        logger.info("Wrote %d %s pickles", idx, split)

    metadata = {
        "compression_factor": factor,
        "vocab_size": int(config.model.l_bins),
    }
    with open(os.path.join(args.save_path, "metadata.json"), "w", encoding="utf-8") as f:
        json.dump(metadata, f)
    logger.info("metadata.json: %s", metadata)
    logger.info("Distinct tokens used: %d / %d", len(token_counts), config.model.l_bins)

    if args.sanity:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        counts = np.zeros(config.model.l_bins)
        for tok, c in token_counts.items():
            counts[tok] = c
        plt.figure(figsize=(12, 4))
        plt.bar(np.arange(len(counts)), counts)
        plt.xlabel("token")
        plt.ylabel("count")
        plt.savefig(os.path.join(args.save_path, "token_histogram.png"))
        plt.close()


if __name__ == "__main__":
    main()
