"""End-to-end text -> speech synthesis from a trained Glow-TTS checkpoint.

Covers the reference's ``GlowTTS.infer_step`` path (reference
models/glow_tts/glow_tts.py:133-168): text -> phonemes -> duration-predicted
alignment -> reverse flow -> mel, then Griffin-Lim mel inversion to a
waveform. Also reports RTF (synthesis seconds per audio second), the
BASELINE.md target metric (< 0.05 on-device for the mel stage).

Usage:
    python -m scripts.synthesize --log_dir ./logs/glow_tts --ckpt_num 100000 \
        --text "Hello world." --out ./sample.wav
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

from speech_masters_thesis_tpu.utils.logging_config import setup_logging

setup_logging()  # honors ./logger.conf / $SMT_LOGGER_CONF (reference parity)
logger = logging.getLogger("synthesize")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log_dir", required=True, type=str)
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a JAX backend (e.g. 'cpu'); default: auto")
    parser.add_argument("--ckpt_num", required=True, type=str)
    parser.add_argument("--text", type=str, default="The quick brown fox jumps over the lazy dog.")
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--max_frames", type=int, default=1024)
    parser.add_argument("--noise_scale", type=float, default=0.667)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--vocoder", type=str, default="device",
                        choices=["device", "host"],
                        help="'device': Griffin-Lim inside jit (ops/griffin_lim.py); "
                             "'host': the artifact-path numpy loop")
    parser.add_argument("--gl_iters", type=int, default=32)
    parser.add_argument("--flow_cache", type=int, default=1,
                        help="1 (default): precompute flow inverses + folded "
                             "weight-norm kernels once (reference store_inverse/"
                             "remove_weight_norm); 0: recompute per call")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from speech_masters_thesis_tpu.models.glow_tts.model import GlowTTS
    from speech_masters_thesis_tpu.text.parser import CMUDictParser, intersperse_blanks
    from speech_masters_thesis_tpu.train.artifacts import mel_to_audio
    from speech_masters_thesis_tpu.train.checkpoint import ckpt_dir
    from speech_masters_thesis_tpu.train.harness import get_model
    from speech_masters_thesis_tpu.utils.audio_io import save_wav
    from speech_masters_thesis_tpu.utils.config import load_config

    config = load_config(os.path.join(args.log_dir, "config.yaml"))
    model = get_model(config)
    assert isinstance(model, GlowTTS), "synthesize drives a GlowTTS checkpoint"
    payload = ocp.PyTreeCheckpointer().restore(ckpt_dir(args.log_dir, args.ckpt_num))
    variables = {"params": payload["state"]["params"], **payload["state"]["model_state"]}

    # Text frontend (reference glow_tts.py:137-144)
    text = args.text.strip()
    if text[-1] not in [".", "!", "?"]:
        text = text + "."
    parser = CMUDictParser(config.dataset.cmudict_path)
    token_ids = parser(text)
    if config.dataset.intersperse_blanks:
        token_ids = intersperse_blanks(token_ids, len(parser.symbols))
    tokens = jnp.asarray(np.asarray(token_ids, np.int32)[None])
    lens = jnp.asarray([tokens.shape[1]], jnp.int32)

    from speech_masters_thesis_tpu.ops.basic import safe_log
    from speech_masters_thesis_tpu.ops.griffin_lim import make_mel_vocoder
    from speech_masters_thesis_tpu.utils import timing

    device_vocoder = args.vocoder == "device"
    vocode = make_mel_vocoder(config.dataset, n_iter=args.gl_iters)

    rng0 = jax.random.PRNGKey(args.seed)
    if args.flow_cache:
        # one-time precompute of flow inverses + folded weight-norm kernels
        # (reference store_inverse/remove_weight_norm); the steady-state
        # program below then runs no LU solve (tests/test_flow_cache.py)
        from speech_masters_thesis_tpu.models.glow_tts.flows import build_flow_cache

        variables = jax.jit(
            lambda t, l, r: build_flow_cache(
                model, variables, t, l, r, max_frames=args.max_frames,
                noise_scale=args.noise_scale, method=GlowTTS.infer))(
                    tokens, lens, rng0)

    @jax.jit
    def infer(tokens, lens, rng):
        mel, z_lengths = model.apply(variables, tokens, lens, rng,
                                     max_frames=args.max_frames,
                                     noise_scale=args.noise_scale, method=GlowTTS.infer)
        audio = None
        if device_vocoder:
            # silence the padded tail so Griffin-Lim doesn't bleed exp(0)=1
            # energies into the valid region (window overlap spans ~4 frames)
            frame = jnp.arange(mel.shape[1])[None, :, None]
            mel_m = jnp.where(frame < z_lengths[:, None, None],
                              mel, safe_log(jnp.zeros((), mel.dtype)))
            audio = vocode(mel_m, jax.random.fold_in(rng, 7))
        return mel, z_lengths, audio

    rng = rng0
    out1 = infer(tokens, lens, rng)
    timing.sync(out1[1])  # compile + real execution barrier (axon-safe)
    start = time.perf_counter()
    mel, z_lengths, audio_dev = infer(tokens, lens, jax.random.fold_in(rng, 1))
    n_frames = int(z_lengths[0])  # host read = execution barrier
    mel_elapsed = time.perf_counter() - start

    mel_np = np.asarray(mel[0, :n_frames])  # [frames, n_mels]
    audio_seconds = n_frames * config.dataset.hop_length / config.dataset.sample_rate

    if device_vocoder:
        audio = np.asarray(audio_dev)[0, :n_frames * config.dataset.hop_length]
        e2e_elapsed = time.perf_counter() - start
        logger.info(
            "text->waveform on device: %d frames (%.2fs audio) in %.4fs — "
            "end-to-end RTF %.4f (target < 0.05)",
            n_frames, audio_seconds, e2e_elapsed,
            e2e_elapsed / max(audio_seconds, 1e-6))
    else:
        logger.info("Synthesized %d mel frames (%.2fs of audio) in %.4fs — mel RTF %.4f",
                    n_frames, audio_seconds, mel_elapsed, mel_elapsed / max(audio_seconds, 1e-6))
        start = time.perf_counter()
        audio = mel_to_audio(mel_np, config)
        gl_elapsed = time.perf_counter() - start
        logger.info("Griffin-Lim inversion: %.2fs (RTF %.3f, host-side artifact path)",
                    gl_elapsed, gl_elapsed / max(audio_seconds, 1e-6))

    out = args.out or os.path.join(args.log_dir, "synthesis.wav")
    save_wav(out, np.clip(audio, -1, 1), config.dataset.sample_rate)
    logger.info("Wrote %s", out)


if __name__ == "__main__":
    main()
