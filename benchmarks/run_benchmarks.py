"""Auxiliary benchmark suite (beyond the single-line bench.py).

Measures the other BASELINE.md metrics on the available device:
  * LM sampling throughput (tokens/sec, KV-cached decode) at reference scale
    (12L / d512 / 16h / ff2048, vocab 512) — the reference's decode loop
    re-forwards the whole prefix per token (transformer_lm.py:143-151)
  * LM training step throughput at reference scale (LM_BATCH overrides)
  * Glow-TTS mel-synthesis RTF at reference scale (12 flow blocks)
  * Glow-TTS training step throughput (on-device MAS; GLOW_FUSED=0 for the
    non-Pallas conditioner)
  * VQ-TTS training step throughput (full novel model; VQTTS_FUSED=0 A/B)
  * MAS: lax.scan vs fused Pallas kernel

Training benches default to the TPU-friendly 'rbg' PRNG for dropout bits
(BENCH_PRNG=threefry opts out; threefry bit-generation measured ~46% of the
LM step).

All timing uses forced host reads (utils/timing.py) — jax.block_until_ready
does not block on this image's axon tunnel platform and inflated round-1
numbers ~114x (VERDICT.md).

Writes (merges into) benchmarks/results.json and prints a summary line per
benchmark. ``--only X`` re-runs one benchmark without clobbering the others'
stored results.

Usage: python -m benchmarks.run_benchmarks [--quick]
       [--only lm|glow|glow_train|mas|vqtts_train|lm_train]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

from speech_masters_thesis_tpu.utils import timing


def bench_lm_sampling(quick: bool = False) -> dict:
    """KV-cached decode throughput — the rebuild's marquee algorithmic win
    over the reference's full-prefix re-forward (transformer_lm.py:143-151).

    Hardened per VERDICT r2 weak #5: median of N repeats with dispersion
    (the single-shot number was host-dispatch sensitive, 5.9-6.6k across
    sessions) plus a batch-scaling curve (4/16/64) — the KV-cache step is
    host-latency-bound at batch 4, so larger batches amortize dispatch.
    """
    import jax

    from speech_masters_thesis_tpu.models.transformer_lm.model import TransformerLM
    from speech_masters_thesis_tpu.utils.config import Config

    n_steps = 64 if quick else 344  # 344 codes = 2s of audio at 172 codes/s
    reps = 2 if quick else 5
    batches = [4] if quick else [4, 16, 64]
    cfg = Config({"model": {
        "vocab_size": 512, "embed_dim": 512, "max_len": 5000, "num_layers": 12,
        "d_model": 512, "nhead": 16, "dim_feedforward": 2048, "dropout": 0.1,
        "activation": "relu", "layer_norm_eps": 1e-5, "norm_first": False,
        "loss_type": "ce",
    }})
    model = TransformerLM(config=cfg.to_dict())
    rng = jax.random.PRNGKey(0)
    tokens = jax.numpy.zeros((1, 8), jax.numpy.int32)
    lens = jax.numpy.full((1,), 8, jax.numpy.int32)
    variables = model.init({"params": rng, "dropout": rng}, tokens, lens, train=False)

    def measure(batch: int) -> dict:
        @jax.jit
        def sample(rng):
            return model.apply(variables, batch, n_steps, rng, sigma=1.0,
                               method=TransformerLM.sample)

        timing.sync(sample(rng))  # compile + execute once
        rates = []
        for i in range(reps):
            start = time.perf_counter()
            timing.sync(sample(jax.random.fold_in(rng, i + 1)))
            rates.append(batch * n_steps / (time.perf_counter() - start))
        rates.sort()
        return {
            "batch": batch,
            "tokens_per_sec_median": round(float(np.median(rates)), 1),
            "tokens_per_sec_min": round(rates[0], 1),
            "tokens_per_sec_max": round(rates[-1], 1),
            "reps": reps,
        }

    curve = [measure(b) for b in batches]

    # One wall-clock INCLUDING the frozen codec decode (the sample_from_lm.py
    # path: LM scan -> bottleneck.decode -> VQ-VAE decoder -> waveform) at the
    # shipped scale, so the marquee number covers the whole audio pipeline.
    codec_wall = None
    if not quick:
        import os as _os
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        from speech_masters_thesis_tpu.utils.config import load_config
        vq_model = load_config(
            _os.path.join(repo, "configs", "models", "vqvae.yaml")).to_dict()
        full = TransformerLM(config={**cfg.to_dict(), "vqvae_model_config": vq_model})
        fv = full.init({"params": rng, "dropout": rng, "codebook": rng},
                       tokens, lens, train=False)

        @jax.jit
        def sample_full(rng):
            return full.apply(fv, 4, n_steps, rng, sigma=1.0,
                              method=TransformerLM.sample)

        timing.sync(sample_full(rng))
        start = time.perf_counter()
        audio, _ = sample_full(jax.random.fold_in(rng, 99))
        timing.sync(audio)
        wall = time.perf_counter() - start
        codec_wall = {
            "batch": 4, "wall_s": round(wall, 4),
            "audio_seconds_per_second": round(4 * n_steps * 128 / 22050 / wall, 2),
        }

    headline = curve[0]
    tokens_per_sec = headline["tokens_per_sec_median"]
    # audio-seconds generated per wall-second (128x compression, 22.05 kHz)
    rtf_inverse = tokens_per_sec * 128 / 22050
    return {
        "metric": "lm_sampling_tokens_per_sec",
        "value": tokens_per_sec,
        "batch": headline["batch"],
        "n_steps": n_steps,
        "dispersion": [headline["tokens_per_sec_min"], headline["tokens_per_sec_max"]],
        "reps": headline["reps"],
        "audio_seconds_per_second": round(rtf_inverse, 2),
        "batch_scaling": curve,
        "with_codec_decode": codec_wall,
    }


def _shipped_glow():
    """Shipped-scale GlowTTS (configs/models/glow_tts.yaml) for RTF benches."""
    from speech_masters_thesis_tpu.models.glow_tts.model import GlowTTS
    from speech_masters_thesis_tpu.utils.config import Config

    cfg = Config({
        "model": {
            "n_speakers": 1, "gin_channels": 0, "intersperse_blanks": None,
            "encoder": {"n_vocab": 148, "out_channels": None, "hidden_channels": 192,
                        "filter_channels": 768, "filter_channels_dp": 256,
                        "kernel_size": 3, "p_dropout": 0.1, "n_layers": 6,
                        "n_heads": 2, "window_size": 4, "prenet": True, "mean_only": True},
            "decoder": {"in_channels": None, "hidden_channels": 192, "kernel_size": 5,
                        "n_blocks": 12, "n_layers": 4, "n_sqz": 2, "n_split": 4,
                        "sigmoid_scale": False, "p_dropout": 0.05, "dilation_rate": 1},
            "ddi": False,
        },
        "dataset": {"n_mels": 80, "intersperse_blanks": True},
    })
    return GlowTTS(config=cfg.to_dict()), cfg


def bench_glow_tts_rtf(quick: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from speech_masters_thesis_tpu.models.glow_tts.model import GlowTTS

    max_frames = 256 if quick else 1024  # ~12s of audio at 86 frames/s
    model, cfg = _shipped_glow()
    rng = jax.random.PRNGKey(0)
    t_text = 128
    tokens = jnp.zeros((1, t_text), jnp.int32)
    lens = jnp.full((1,), t_text, jnp.int32)
    mels = jnp.zeros((1, 64, 80), jnp.float32)
    mlens = jnp.full((1,), 64, jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, tokens, lens, mels, mlens,
                           train=False)

    @jax.jit
    def infer(rng):
        return model.apply(variables, tokens, lens, rng, max_frames=max_frames,
                           method=GlowTTS.infer)

    timing.sync(infer(rng))
    start = time.perf_counter()
    timing.sync(infer(jax.random.fold_in(rng, 1)))
    elapsed = time.perf_counter() - start
    audio_seconds = max_frames * 256 / 22050  # full padded output

    # A/B the inference flow cache (stored invconv inverses + folded WN
    # kernels — reference store_inverse/remove_weight_norm; flows.py)
    from speech_masters_thesis_tpu.models.glow_tts.flows import build_flow_cache

    variables_c = jax.jit(lambda r: build_flow_cache(
        model, variables, tokens, lens, r, max_frames=max_frames,
        method=GlowTTS.infer))(rng)

    @jax.jit
    def infer_cached(rng):
        return model.apply(variables_c, tokens, lens, rng, max_frames=max_frames,
                           method=GlowTTS.infer)

    timing.sync(infer_cached(rng))
    start = time.perf_counter()
    timing.sync(infer_cached(jax.random.fold_in(rng, 1)))
    elapsed_cached = time.perf_counter() - start

    # full text->WAVEFORM path: reverse flow + on-device Griffin-Lim in ONE
    # jitted program (ops/griffin_lim.py; VERDICT r2 item 5). The BASELINE
    # "synthesis RTF < 0.05" target is judged on this number, not mel-only.
    from speech_masters_thesis_tpu.ops.griffin_lim import make_mel_vocoder
    from speech_masters_thesis_tpu.utils.config import Config as _C

    vocode = make_mel_vocoder(_C({"sample_rate": 22050, "n_fft": 1024,
                                  "hop_length": 256, "win_length": 1024,
                                  "n_mels": 80}), n_iter=32)

    @jax.jit
    def infer_and_vocode(rng):
        mel, z_lengths = model.apply(variables, tokens, lens, rng,
                                     max_frames=max_frames, method=GlowTTS.infer)
        return vocode(mel, jax.random.fold_in(rng, 7)), z_lengths

    timing.sync(infer_and_vocode(rng))
    start = time.perf_counter()
    audio, _ = infer_and_vocode(jax.random.fold_in(rng, 2))
    audio_host = np.asarray(audio)  # D2H of the waveform = execution barrier
    e2e_elapsed = time.perf_counter() - start
    assert audio_host.shape[-1] == max_frames * 256

    return {
        "metric": "glow_tts_mel_rtf",
        "value": round(elapsed / audio_seconds, 5),
        "frames": max_frames,
        "elapsed_s": round(elapsed, 4),
        "mel_rtf_flow_cached": round(elapsed_cached / audio_seconds, 5),
        "e2e_rtf": round(e2e_elapsed / audio_seconds, 5),
        "e2e_elapsed_s": round(e2e_elapsed, 4),
        "gl_iters": 32,
        "note": "mel-synthesis wall-time / synthesized audio seconds; "
                "mel_rtf_flow_cached uses stored inverses + folded WN kernels "
                "(store_inverse/remove_weight_norm equivalent); e2e_rtf adds "
                "on-device Griffin-Lim + waveform D2H (BASELINE target < 0.05)",
    }


def bench_e2e_rtf(quick: bool = False) -> dict:
    """Full user-facing synthesis pipeline RTF (VERDICT r4 next #5): raw
    text -> CMUDict phonemes -> blank interspersal -> flow-cached reverse
    flow -> on-device Griffin-Lim -> waveform on the host. Exactly the
    ``scripts/synthesize.py --vocoder device --flow_cache 1`` path
    (reference inversion anchor: utils/train_utils.py:249-304), measured at
    the shipped Glow-TTS scale against the BASELINE "synthesis RTF < 0.05"
    target. RTF convention: wall seconds per synthesized audio second of
    the fixed-shape program (max_frames; the jitted compute is
    shape-determined, matching bench_glow_tts_rtf)."""
    import jax
    import jax.numpy as jnp

    from speech_masters_thesis_tpu.models.glow_tts.flows import build_flow_cache
    from speech_masters_thesis_tpu.models.glow_tts.model import GlowTTS
    from speech_masters_thesis_tpu.ops.basic import safe_log
    from speech_masters_thesis_tpu.ops.griffin_lim import make_mel_vocoder
    from speech_masters_thesis_tpu.text.parser import (
        CMUDictParser, intersperse_blanks)
    from speech_masters_thesis_tpu.utils.config import Config

    cmudict_path = os.environ.get("E2E_CMUDICT", "./data/cmudict.dict")
    if not os.path.exists(cmudict_path):
        # self-contained: the miniature dict the synth corpus ships with
        from scripts.make_synth_dataset import WORDS
        os.makedirs(os.path.dirname(os.path.abspath(cmudict_path)), exist_ok=True)
        with open(cmudict_path, "w", encoding="utf-8") as f:
            for word, phones in WORDS.items():
                f.write(f"{word}  {phones}\n")

    model, cfg = _shipped_glow()
    parser = CMUDictParser(cmudict_path)
    gl_iters = 32
    max_frames = 256 if quick else 1024
    hop, sr, pad_tokens = 256, 22050, 128
    text = "The quick brown fox jumps over the lazy dog."

    def frontend(text: str):
        # host text frontend, included in the timed region (it is part of
        # what a user pays per utterance); padded to a fixed token length so
        # every utterance reuses one compiled program
        ids = parser(text)
        ids = intersperse_blanks(ids, len(parser.symbols))
        n = len(ids)
        assert n <= pad_tokens
        arr = np.zeros((1, pad_tokens), np.int32)
        arr[0, :n] = ids
        return jnp.asarray(arr), jnp.asarray([n], jnp.int32)

    tokens, lens = frontend(text)
    rng0 = jax.random.PRNGKey(0)
    variables = model.init({"params": rng0, "dropout": rng0}, tokens, lens,
                           jnp.zeros((1, 64, 80), jnp.float32),
                           jnp.full((1,), 64, jnp.int32), train=False)
    vocode = make_mel_vocoder(Config({"sample_rate": sr, "n_fft": 1024,
                                      "hop_length": hop, "win_length": 1024,
                                      "n_mels": 80}), n_iter=gl_iters)
    variables = jax.jit(lambda t, l, r: build_flow_cache(
        model, variables, t, l, r, max_frames=max_frames,
        method=GlowTTS.infer))(tokens, lens, rng0)

    @jax.jit
    def infer_and_vocode(tokens, lens, rng):
        mel, z_lengths = model.apply(variables, tokens, lens, rng,
                                     max_frames=max_frames, method=GlowTTS.infer)
        # silence the padded tail so Griffin-Lim doesn't bleed exp(0)=1
        # energies into the valid region (scripts/synthesize.py:114-119)
        frame = jnp.arange(mel.shape[1])[None, :, None]
        mel_m = jnp.where(frame < z_lengths[:, None, None],
                          mel, safe_log(jnp.zeros((), mel.dtype)))
        return vocode(mel_m, jax.random.fold_in(rng, 7)), z_lengths

    np.asarray(infer_and_vocode(tokens, lens, rng0)[0])  # compile + settle
    reps = 3 if quick else 5
    walls = []
    for i in range(reps):
        start = time.perf_counter()
        tok_i, len_i = frontend(text)
        audio, _ = infer_and_vocode(tok_i, len_i, jax.random.fold_in(rng0, i))
        audio_host = np.asarray(audio)  # D2H of the waveform = barrier
        walls.append(time.perf_counter() - start)
    assert audio_host.shape[-1] == max_frames * hop
    wall = float(np.median(walls))
    audio_seconds = max_frames * hop / sr

    return {
        "metric": "e2e_synthesis_rtf",
        "value": round(wall / audio_seconds, 5),
        "wall_s": round(wall, 4),
        "dispersion": [round(min(walls), 4), round(max(walls), 4)],
        "reps": reps,
        "frames": max_frames,
        "audio_seconds": round(audio_seconds, 2),
        "gl_iters": gl_iters,
        "flow_cached": True,
        "note": "text->phonemes->reverse flow->device Griffin-Lim->waveform "
                "D2H, one utterance/program (scripts/synthesize.py path); "
                "BASELINE target < 0.05",
    }


def _select_train_prng():
    """TPU-friendly rbg PRNG for dropout bits (threefry bit-generation
    measured ~46% of the LM train step; sampling's per-token fold_in pattern
    is FASTER with threefry, so only the train benches switch).
    BENCH_PRNG=threefry opts out."""
    import jax

    if os.environ.get("BENCH_PRNG", "rbg") == "rbg" and jax.default_backend() == "tpu":
        jax.config.update("jax_default_prng_impl", "rbg")


def build_glow_step(quick: bool = False):
    """Reference-scale Glow-TTS train step. Returns (step, state, batch_data,
    key, meta) — shared by bench_glow_train and tools/perf_profile."""
    import jax

    _select_train_prng()

    from speech_masters_thesis_tpu.models.ema import default_mu
    from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh, place_replicated, shard_batch
    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.train.loop import make_train_step
    from speech_masters_thesis_tpu.train.optim import build_optimizer
    from speech_masters_thesis_tpu.train.state import TrainState
    from speech_masters_thesis_tpu.utils.config import Config

    batch, frames, tokens = (4, 128, 32) if quick else (8, 768, 128)
    # GLOW_SPD=K: K steps lax.scanned in ONE program (train.py
    # --steps_per_dispatch). The round-2 Glow trace showed device-busy at
    # only ~14.5 of the 20.6 ms wall step (scheduling/dispatch gaps) — this
    # is the production lever for exactly that gap.
    spd = int(os.environ.get("GLOW_SPD", "1"))
    config = Config({
        "model": {
            "_import_": "models.glow_tts.glow_tts.GlowTTS",
            # fused Pallas coupling conditioner (ops/pallas/wn_coupling.py);
            # GLOW_FUSED=0 opts out for A/B timing
            "fused_blocks": os.environ.get("GLOW_FUSED", "1") == "1",
            # A/B: whole-flow-step kernel vs conditioner-only fusion.
            # Default OFF to match glow_tts_tpu.yaml: the r5 chip A/B
            # measured 19.52 ms/step flow-step-fused vs 15.93 ms
            # conditioner-only (benchmarks/hw_logs/r5/glow_condonly.log).
            "fused_flow_step": os.environ.get("GLOW_FLOW_STEP", "0") == "1",
            # A/B: fused TextEncoder layers (ops/pallas/enc_layer.py);
            # follows GLOW_FUSED unless GLOW_ENC overrides
            "fused_encoder": os.environ.get(
                "GLOW_ENC", os.environ.get("GLOW_FUSED", "1")) == "1",
            "n_speakers": 1, "gin_channels": 0, "intersperse_blanks": None,
            "encoder": {"n_vocab": 148, "out_channels": None, "hidden_channels": 192,
                        "filter_channels": 768, "filter_channels_dp": 256,
                        "kernel_size": 3, "p_dropout": 0.1, "n_layers": 6,
                        "n_heads": 2, "window_size": 4, "prenet": True, "mean_only": True},
            "decoder": {"in_channels": None, "hidden_channels": 192, "kernel_size": 5,
                        "n_blocks": 12, "n_layers": 4, "n_sqz": 2, "n_split": 4,
                        "sigmoid_scale": False, "p_dropout": 0.05, "dilation_rate": 1},
            "ddi": False,
        },
        "dataset": {"_import_": "datasets.ljspeech.LJSpeech", "sample_rate": 22050,
                    "n_fft": 1024, "hop_length": 256, "win_length": 1024, "n_mels": 80,
                    "intersperse_blanks": True, "segment_length": -1,
                    "use_token": True, "use_spect": True, "use_audio": False},
        "optimizer": {"name": "adam", "lr": 1.0, "betas": [0.9, 0.98],
                      "weight_decay": 0, "eps": 1e-9},
        "scheduler": {"name": "noam", "warmup_steps": 4000},
        "train": {"log_dir": "/tmp/bench_glow", "seed": 0, "batch_size": batch,
                  "ema": False, "grad_clip_norm": 1.0, "fp16": False, "bf16": True,
                  "num_workers": 0, "n_devices": -1, "total_epochs": 1,
                  "load_ckpt": None, "ckpt_every_n_steps": 10 ** 9,
                  "log_every_n_steps": 10 ** 9, "eval_every_n_epochs": 1,
                  "run_sanity_val_epoch": False, "max_steps": None},
    })
    mesh = make_data_mesh()
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, 1.0)
    state = place_replicated(mesh, TrainState.create(variables, tx, use_ema=False))
    if spd > 1:
        from speech_masters_thesis_tpu.train.loop import make_train_multistep
        step = make_train_multistep(model, tx, default_mu(batch, 1), use_ema=False,
                                    steps_per_dispatch=spd, mesh=mesh, bf16=True)
    else:
        step = make_train_step(model, tx, default_mu(batch, 1), use_ema=False,
                               mesh=mesh, bf16=True)

    rng = np.random.RandomState(0)
    batch_data = shard_batch(mesh, {
        "token": rng.randint(0, 149, (spd * batch, tokens)).astype(np.int32),
        "token_len": np.full((spd * batch,), tokens, np.int32),
        "spect": (rng.randn(spd * batch, frames, 80) * 0.5 - 4).astype(np.float32),
        "spect_len": np.full((spd * batch,), frames, np.int32),
        "speaker": None,
    })
    key = jax.random.PRNGKey(0)
    meta = {"batch": batch, "frames": frames, "spd": spd,
            "per_step_units": batch * frames}
    return step, state, batch_data, key, meta


def bench_glow_train(quick: bool = False) -> dict:
    """Glow-TTS training step throughput at reference scale (mel-frames/s).

    With GLOW_SPD=K the timed unit is one K-step dispatch, normalized back
    to per-step (same protocol as bench_lm_train)."""
    step, state, batch_data, key, meta = build_glow_step(quick)
    spd = meta["spd"]
    flops = timing.compiled_flops(step, state, batch_data, key)

    def run_one(carry):
        new_state, sc = step(carry, batch_data, key)
        loss = sc["loss"]
        return new_state, (loss[-1] if spd > 1 else loss)

    sec_per_dispatch, _ = timing.time_steps(run_one, state, warmup=3, steps=10)
    report = timing.rate_report(per_step_units=meta["per_step_units"],
                                sec_per_step=sec_per_dispatch / spd,
                                flops_per_step=flops / spd if flops else flops,
                                bf16=True)
    out = {
        "metric": "glow_tts_train_mel_frames_per_sec",
        **report,
        "batch": meta["batch"], "frames": meta["frames"],
        "note": "reference runs MAS on CPU NumPy every step; here it is on-device",
    }
    if spd > 1:
        out["steps_per_dispatch"] = spd
    return out


def bench_mas(quick: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from speech_masters_thesis_tpu.ops.mas import maximum_path
    from speech_masters_thesis_tpu.ops.pallas.mas import maximum_path_pallas

    b, t_x, t_y = (2, 64, 256) if quick else (8, 256, 1024)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(b, t_x, t_y).astype(np.float32))
    mask = jnp.ones((b, t_x, t_y), jnp.float32)

    def timed(fn, reps=5):
        out = fn(value, mask)
        timing.sync(out)  # compile + run
        start = time.perf_counter()
        for _ in range(reps):
            out = fn(value, mask)
        timing.sync(out)
        return (time.perf_counter() - start) / reps * 1e3, out

    scan_ms, out_scan = timed(jax.jit(maximum_path))
    result = {"metric": "mas_ms", "shape": [b, t_x, t_y], "scan_ms": round(scan_ms, 3)}
    # unroll ladder: rows processed per kernel loop iteration (slab VMEM IO +
    # loop-overhead amortization; ops/pallas/mas.py). 8 is the shipped default.
    for unroll in ([8] if quick else [1, 4, 8, 16, 32]):
        try:
            pallas_ms, out_pallas = timed(
                functools.partial(maximum_path_pallas, unroll=unroll))
            result[f"pallas_u{unroll}_ms"] = round(pallas_ms, 3)
            if unroll == 8:
                result["pallas_ms"] = round(pallas_ms, 3)
            result.setdefault("pallas_matches_scan", True)
            result["pallas_matches_scan"] &= bool(jnp.array_equal(out_pallas, out_scan))
        except Exception as e:  # pragma: no cover - backend-specific
            result[f"pallas_u{unroll}_error"] = str(e)[:200]
    # shipped Glow/VQ-TTS shapes (bucketed): the stress shape above overstates
    # t_y; record the in-pipeline shape too
    if not quick:
        b2, tx2, ty2 = 8, 193, 384
        value = jnp.asarray(rng.randn(b2, tx2, ty2).astype(np.float32))
        mask = jnp.ones((b2, tx2, ty2), jnp.float32)
        s_ms, o_s = timed(jax.jit(maximum_path))
        p_ms, o_p = timed(functools.partial(maximum_path_pallas, unroll=8))
        result["shipped_shape"] = [b2, tx2, ty2]
        result["shipped_scan_ms"] = round(s_ms, 3)
        result["shipped_pallas_ms"] = round(p_ms, 3)
        result["shipped_matches"] = bool(jnp.array_equal(o_p, o_s))
    return result


def build_lm_step(quick: bool = False):
    """Reference-scale TransformerLM train step (12L/d512/16h, vocab 512,
    batch 8 x 257 tokens = BOS + one 256-code segment — the reference's
    train_transformer_lm.sh configuration). The frozen VQ-VAE decoder graft
    is omitted: it does not participate in supervised_step (only in
    sampling/artifacts), so the step cost is identical. Returns (step,
    state, batch_data, key, meta)."""
    import jax

    _select_train_prng()

    from speech_masters_thesis_tpu.models.ema import default_mu
    from speech_masters_thesis_tpu.parallel.mesh import (
        make_data_mesh, place_replicated, shard_batch)
    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.train.loop import make_train_step
    from speech_masters_thesis_tpu.train.optim import build_optimizer
    from speech_masters_thesis_tpu.train.state import TrainState
    from speech_masters_thesis_tpu.utils.config import Config

    batch, tokens = (2, 64) if quick else (8, 257)
    batch = int(os.environ.get("LM_BATCH", batch))  # reference trains batch 8
    tokens = int(os.environ.get("LM_TOKENS", tokens))
    # LM_SPD=K measures the production train.py --steps_per_dispatch lever
    # at this scale: K steps lax.scanned in ONE compiled program (the
    # counterpart of tools/dispatch_probe's synthetic scan-of-K ceiling).
    spd = int(os.environ.get("LM_SPD", "1"))
    config = Config({
        "model": {
            "_import_": "models.transformer_lm.transformer_lm.TransformerLM",
            # Fused attention — default ON: at T <= 1024 this routes to the
            # small-T VMEM-resident Pallas kernel (ops/pallas/attention.py;
            # batch 8: 11.7 -> 11.3 ms, batch 64: 130.5 -> 67.9 ms, 1.92x —
            # the [B,H,T,T] HBM tensors vanish). Long T uses the stock flash
            # kernel (O(T) memory). LM_FUSED=0 opts out for A/B.
            "fused_attention": os.environ.get(
                "LM_FUSED", os.environ.get("LM_FLASH", "1")) == "1",
            "vocab_size": 512, "embed_dim": 512, "max_len": 5000,
            "num_layers": 12, "d_model": 512, "nhead": 16,
            "dim_feedforward": 2048, "dropout": 0.1, "activation": "relu",
            "layer_norm_eps": 1e-5, "norm_first": False, "loss_type": "ce",
        },
        "dataset": {"_import_": "datasets.vqlatent.VQLatent", "sample_rate": 22050,
                    "n_fft": 1024, "hop_length": 256, "win_length": 1024,
                    "n_mels": 80, "segment_length": 256,
                    "use_token": True, "use_spect": False, "use_audio": False},
        "optimizer": {"name": "adam", "lr": 0.0002, "betas": [0.9, 0.98],
                      "weight_decay": 0, "eps": 1e-9},
        "scheduler": {"name": "linear", "warmup_steps": 1000},
        "train": {"log_dir": "/tmp/bench_lm", "seed": 0, "batch_size": batch,
                  "ema": False, "grad_clip_norm": None, "fp16": False, "bf16": True,
                  "num_workers": 0, "n_devices": -1, "total_epochs": 1,
                  "load_ckpt": None, "ckpt_every_n_steps": 10 ** 9,
                  "log_every_n_steps": 10 ** 9, "eval_every_n_epochs": 1,
                  "run_sanity_val_epoch": False, "max_steps": None},
    })
    mesh = make_data_mesh()
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, 1.0)
    state = place_replicated(mesh, TrainState.create(variables, tx, use_ema=False))
    if spd > 1:
        from speech_masters_thesis_tpu.train.loop import make_train_multistep
        step = make_train_multistep(model, tx, default_mu(batch, 1), use_ema=False,
                                    steps_per_dispatch=spd, mesh=mesh, bf16=True)
    else:
        step = make_train_step(model, tx, default_mu(batch, 1), use_ema=False,
                               mesh=mesh, bf16=True)

    rng = np.random.RandomState(0)
    batch_data = shard_batch(mesh, {
        "token": rng.randint(2, 514, (spd * batch, tokens)).astype(np.int32),
        "token_len": np.full((spd * batch,), tokens, np.int32),
        "audio": None, "audio_len": None, "speaker": None,
    })
    key = jax.random.PRNGKey(0)
    meta = {"batch": batch, "tokens": tokens, "spd": spd,
            "per_step_units": batch * tokens}
    return step, state, batch_data, key, meta


def bench_lm_train(quick: bool = False) -> dict:
    """LM train-step throughput; see build_lm_step for the configuration.

    With LM_SPD=K the timed unit is one K-step dispatch; the report is
    normalized back to per-step so the number is directly comparable with
    the K=1 row (the delta is the amortized host/dispatch fixed cost)."""
    step, state, batch_data, key, meta = build_lm_step(quick)
    spd = meta["spd"]
    flops = timing.compiled_flops(step, state, batch_data, key)

    def run_one(carry):
        new_state, sc = step(carry, batch_data, key)
        loss = sc["loss"]
        return new_state, (loss[-1] if spd > 1 else loss)

    sec_per_dispatch, _ = timing.time_steps(run_one, state, warmup=3, steps=20)
    report = timing.rate_report(per_step_units=meta["per_step_units"],
                                sec_per_step=sec_per_dispatch / spd,
                                flops_per_step=flops / spd if flops else flops,
                                bf16=True)
    out = {
        "metric": "lm_train_tokens_per_sec",
        **report,
        "batch": meta["batch"], "tokens": meta["tokens"],
        "note": "12L/d512 reference scale; audio-seconds equivalent = tokens * 128 / 22050",
    }
    if spd > 1:
        out["steps_per_dispatch"] = spd
    return out


def build_vqtts_step(quick: bool = False):
    """VQ-TTS (the thesis's novel model) train step.

    Loads the shipped configs (vqtts_tpu.yaml unless VQTTS_FUSED=0) so it
    measures the real CLI path: TextEncoder + audio codec (fused Pallas
    GatedHiFi blocks) + text<->audio MAS + grouped bottleneck + 6-term loss.
    Reference anchor: scripts/train_vqvae.sh runs this model at batch 1 on
    GPU with per-step CPU MAS. Returns (step, state, batch_data, key, meta).
    """
    import jax

    _select_train_prng()

    from speech_masters_thesis_tpu.models.ema import default_mu
    from speech_masters_thesis_tpu.parallel.mesh import (
        make_data_mesh, place_replicated, shard_batch)
    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.train.loop import make_train_step
    from speech_masters_thesis_tpu.train.optim import build_optimizer
    from speech_masters_thesis_tpu.train.state import TrainState
    from speech_masters_thesis_tpu.utils.config import Config, load_config

    fused = os.environ.get("VQTTS_FUSED", "1") == "1" and jax.default_backend() == "tpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = "vqtts_tpu.yaml" if fused else "vqtts.yaml"
    config = load_config(os.path.join(repo, "configs", "models", name))
    # A/B: fused TextEncoder layers (ops/pallas/enc_layer.py). Default OFF
    # to match vqtts_tpu.yaml: the r5 chip A/B measured 26.79 ms/step fused
    # vs 25.57 ms flax (benchmarks/hw_logs/r5/vqtts_noenc.log).
    config = config.merge(Config({"model": {"fused_encoder": os.environ.get(
        "VQTTS_ENC", "0") == "1"}}))
    config = config.merge(load_config(os.path.join(repo, "configs", "datasets", "ljspeech.yaml")))
    batch, seconds, tokens = (2, 1.0, 24) if quick else (4, 2.0, 64)
    config = config.merge(Config({"train": {
        "log_dir": "/tmp/bench_vqtts", "seed": 0, "batch_size": batch, "ema": False,
        "grad_clip_norm": None, "fp16": False, "bf16": True, "num_workers": 0,
        "n_devices": -1, "total_epochs": 1, "load_ckpt": None,
        "ckpt_every_n_steps": 10 ** 9, "log_every_n_steps": 10 ** 9,
        "eval_every_n_epochs": 1, "run_sanity_val_epoch": False, "max_steps": None,
    }}))

    sr = config.dataset.sample_rate
    hop = config.dataset.hop_length
    t_samples = int(seconds * sr) // 512 * 512
    # VQTTS_SPD=K: K steps per dispatch (same lever as GLOW_SPD/LM_SPD)
    spd = int(os.environ.get("VQTTS_SPD", "1"))
    mesh = make_data_mesh()
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, 1.0)
    state = place_replicated(mesh, TrainState.create(variables, tx, use_ema=False))
    if spd > 1:
        from speech_masters_thesis_tpu.train.loop import make_train_multistep
        step = make_train_multistep(model, tx, default_mu(batch, 1), use_ema=False,
                                    steps_per_dispatch=spd, mesh=mesh, bf16=True)
    else:
        step = make_train_step(model, tx, default_mu(batch, 1), use_ema=False,
                               mesh=mesh, bf16=True)

    rng = np.random.RandomState(0)
    batch_data = shard_batch(mesh, {
        "token": rng.randint(1, 149, (spd * batch, tokens)).astype(np.int32),
        "token_len": np.full((spd * batch,), tokens, np.int32),
        "audio": (rng.uniform(-0.5, 0.5, (spd * batch, t_samples))).astype(np.float32),
        "audio_len": np.full((spd * batch,), t_samples, np.int32),
        "speaker": None,
    })
    key = jax.random.PRNGKey(0)
    meta = {"batch": batch, "audio_seconds": seconds, "fused": fused, "spd": spd,
            "per_step_units": batch * t_samples / hop}
    return step, state, batch_data, key, meta


def bench_vqtts_train(quick: bool = False) -> dict:
    """VQ-TTS train-step throughput; see build_vqtts_step for the config.

    With VQTTS_SPD=K the timed unit is one K-step dispatch, normalized back
    to per-step (same protocol as bench_lm_train)."""
    step, state, batch_data, key, meta = build_vqtts_step(quick)
    spd = meta["spd"]
    flops = timing.compiled_flops(step, state, batch_data, key)

    def run_one(carry):
        new_state, sc = step(carry, batch_data, key)
        loss = sc["loss"]
        return new_state, (loss[-1] if spd > 1 else loss)

    sec_per_dispatch, _ = timing.time_steps(run_one, state, warmup=3, steps=10)
    report = timing.rate_report(per_step_units=meta["per_step_units"],
                                sec_per_step=sec_per_dispatch / spd,
                                flops_per_step=flops / spd if flops else flops,
                                bf16=True)
    out = {
        "metric": "vqtts_train_mel_frames_per_sec",
        **report,
        "batch": meta["batch"], "audio_seconds": meta["audio_seconds"],
        "fused": meta["fused"],
        "note": "reference trains this at batch 1 with per-step CPU MAS (train_vqvae.sh)",
    }
    if spd > 1:
        out["steps_per_dispatch"] = spd
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--only", type=str, default=None,
                        choices=[None, "lm", "glow", "e2e_rtf", "glow_train",
                                 "mas", "vqtts_train", "lm_train"])
    parser.add_argument("--no-save", action="store_true",
                        help="print JSON but do not merge into results.json "
                             "(A/B variant runs: results.json must only ever "
                             "hold the shipped default configuration)")
    args = parser.parse_args()

    from speech_masters_thesis_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    results = {}
    if args.only in (None, "lm"):
        results["lm_sampling"] = bench_lm_sampling(args.quick)
        print(json.dumps(results["lm_sampling"]))
    if args.only in (None, "glow"):
        results["glow_tts_rtf"] = bench_glow_tts_rtf(args.quick)
        print(json.dumps(results["glow_tts_rtf"]))
    if args.only in (None, "e2e_rtf"):
        results["e2e_synthesis_rtf"] = bench_e2e_rtf(args.quick)
        print(json.dumps(results["e2e_synthesis_rtf"]))
    if args.only in (None, "glow_train"):
        results["glow_train"] = bench_glow_train(args.quick)
        print(json.dumps(results["glow_train"]))
    if args.only in (None, "mas"):
        results["mas"] = bench_mas(args.quick)
        print(json.dumps(results["mas"]))
    if args.only in (None, "vqtts_train"):
        results["vqtts_train"] = bench_vqtts_train(args.quick)
        print(json.dumps(results["vqtts_train"]))
    if args.only in (None, "lm_train"):
        results["lm_train"] = bench_lm_train(args.quick)
        print(json.dumps(results["lm_train"]))

    # Provenance: stamp every freshly-measured record with when/where it was
    # measured, so stale rows in results.json are distinguishable from the
    # current round's (older rows simply lack the stamp).
    import datetime

    import jax
    stamp = {"measured_utc": datetime.datetime.now(datetime.timezone.utc)
             .strftime("%Y-%m-%dT%H:%MZ"),
             "backend": jax.default_backend()}
    for v in results.values():
        v.update(stamp)

    # Merge into the stored results so --only runs don't clobber the rest
    # (round-1 VERDICT weak #5).
    if args.no_save:
        return
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    stored = {}
    if os.path.exists(out):
        try:
            with open(out, encoding="utf-8") as f:
                stored = json.load(f)
        except (json.JSONDecodeError, OSError):
            stored = {}
    stored.update(results)
    with open(out, "w", encoding="utf-8") as f:
        json.dump(stored, f, indent=2)


if __name__ == "__main__":
    main()
