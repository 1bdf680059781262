"""Samples audio from a trained Transformer LM through the frozen VQ-VAE.

Rebuild of reference scripts/sample_from_lm.py:1-112. The decode loop is
KV-cached (models/transformer_lm/model.py::sample) — one compiled lax.scan —
instead of the reference's full-prefix re-forward per token.

Usage:
    python -m scripts.sample_from_lm --log_dir ./logs/transformer_lm \
        --ckpt_num 50000 --n_samples 4 --n_steps 344 --sigma 1.0
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

from speech_masters_thesis_tpu.utils.logging_config import setup_logging

setup_logging()  # honors ./logger.conf / $SMT_LOGGER_CONF (reference parity)
logger = logging.getLogger("sample_from_lm")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log_dir", required=True, type=str)
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a JAX backend (e.g. 'cpu'); default: auto")
    parser.add_argument("--ckpt_num", required=True, type=str)
    parser.add_argument("--save_path", type=str, default=None)
    parser.add_argument("--n_samples", type=int, default=4)
    parser.add_argument("--n_steps", type=int, default=344,
                        help="Codes to sample; 344 codes = 2s at 172 codes/s")
    parser.add_argument("--sigma", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args()


def main():
    args = parse_args()
    assert args.sigma > 0, "Temperature scalar must be positive"

    import jax

    if args.platform:
        # must be the config API (the TPU plugin overrides JAX_PLATFORMS),
        # and must run before the first backend use — orbax restore below
        # touches the default backend. This was missing: --platform cpu
        # silently ran on the TPU (and hung when the chip lease was wedged).
        jax.config.update("jax_platforms", args.platform)

    import orbax.checkpoint as ocp

    from speech_masters_thesis_tpu.models.transformer_lm.model import TransformerLM
    from speech_masters_thesis_tpu.train.artifacts import spects_to_grid
    from speech_masters_thesis_tpu.train.checkpoint import ckpt_dir
    from speech_masters_thesis_tpu.train.harness import get_model
    from speech_masters_thesis_tpu.utils.audio_io import save_wav
    from speech_masters_thesis_tpu.utils.config import load_config
    from speech_masters_thesis_tpu.ops.stft import cached_mel

    config = load_config(os.path.join(args.log_dir, "config.yaml"))
    save_path = args.save_path or os.path.join(args.log_dir, "samples")
    os.makedirs(save_path, exist_ok=True)

    model = get_model(config)
    assert isinstance(model, TransformerLM)
    payload = ocp.PyTreeCheckpointer().restore(ckpt_dir(args.log_dir, args.ckpt_num))
    variables = {"params": payload["state"]["params"], **payload["state"]["model_state"]}

    @jax.jit
    def sample_fn(rng):
        return model.apply(variables, args.n_samples, args.n_steps, rng,
                           sigma=args.sigma, method=TransformerLM.sample)

    rng = jax.random.PRNGKey(args.seed)
    # compile once, then time the steady-state sampling rate
    audio, codes = jax.block_until_ready(sample_fn(rng))
    start = time.perf_counter()
    audio, codes = jax.block_until_ready(sample_fn(jax.random.fold_in(rng, 1)))
    elapsed = time.perf_counter() - start
    tokens_per_sec = args.n_samples * args.n_steps / elapsed
    logger.info("Sampled %dx%d codes in %.3fs (%.1f tokens/s)",
                args.n_samples, args.n_steps, elapsed, tokens_per_sec)

    audio = np.asarray(audio)
    codes = np.asarray(codes)
    ds = config.dataset
    mel_op = cached_mel(ds.sample_rate, ds.n_fft, ds.hop_length, ds.win_length,
                        ds.n_mels, 0.0, 8000.0)
    mels = []
    with open(os.path.join(save_path, "tokens.txt"), "w", encoding="utf-8") as f:
        for i in range(args.n_samples):
            wav = np.clip(audio[i], -1, 1)
            save_wav(os.path.join(save_path, f"sample_{i}.wav"), wav, ds.sample_rate)
            mels.append(np.asarray(mel_op(wav[None]))[0].T)
            f.write(" ".join(str(int(t)) for t in codes[i]) + "\n")

    import jax.numpy as jnp  # noqa: F401 (mel already computed)
    from PIL import Image
    grid = spects_to_grid(np.asarray(mels), np.asarray(mels), n=min(4, args.n_samples))
    Image.fromarray(grid).save(os.path.join(save_path, "samples_mel.png"))
    logger.info("Wrote %d samples to %s", args.n_samples, save_path)


if __name__ == "__main__":
    main()
