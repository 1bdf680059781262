"""Harness: model/dataset factories, state init, feature elision.

Rebuild of reference utils/commons.py:21-117 in functional form. Models are
resolved through the registry (drop-in compatible with reference
``_import_`` strings), feature elision flags are derived from the model's
task class (reference commons.py:38-43), and parameter/variable
initialization happens once on a dummy batch shaped by the model.
"""

from __future__ import annotations

import logging
from typing import Tuple

import jax
import numpy as np

from speech_masters_thesis_tpu.data.batching import DataLoader
from speech_masters_thesis_tpu.models.base import TASK_FEATURES, TOKEN_TO_SPECTROGRAM
from speech_masters_thesis_tpu.utils.registry import resolve_dataset, resolve_model

logger = logging.getLogger(__name__)


def get_model(config):
    """Instantiates the model and applies dataset feature elision.

    For models holding a frozen VQ-VAE (TransformerLM), the pointed-at
    checkpoint's config is loaded from <log_dir>/config.yaml and injected as
    ``vqvae_model_config`` so the submodules can be constructed (reference
    transformer_lm.py:85-92).
    """
    import os
    from speech_masters_thesis_tpu.utils.config import load_config

    if "vqvae" in config.model and "log_dir" in config.model.get("vqvae", {}):
        vq_config_path = os.path.join(config.model.vqvae.log_dir, "config.yaml")
        if os.path.exists(vq_config_path):
            config["vqvae_model_config"] = load_config(vq_config_path).to_dict()
        else:
            logger.warning("VQ-VAE config %s not found; reconstruction disabled", vq_config_path)

    model_cls = resolve_model(config.model["_import_"])
    model = model_cls(config=config.to_dict())
    for key, value in TASK_FEATURES[model_cls.TASK].items():
        config.dataset[key] = value
    if (config.dataset.get("on_device_spect") and config.dataset.get("use_spect")
            and model_cls.TASK == TOKEN_TO_SPECTROGRAM):
        # ship raw audio instead of host-extracted mel; the model computes
        # the spectrogram inside the jitted step (models/base.py:
        # spect_from_audio — the 1-core host cannot feed mel fast enough).
        # Gated on the task: only TokenToSpectrogramModel.supervised_step
        # (and GlowTTS.ddi) implement the audio->mel fallback; a
        # SPECTROGRAM_RECONSTRUCTION model would receive spect=None and crash.
        config.dataset["use_spect"] = False
        config.dataset["use_audio"] = True
    return model


def load_pretrained_submodules(model, variables: dict, config) -> dict:
    """Grafts cross-program checkpoints (e.g. frozen VQ-VAE) into variables."""
    if hasattr(model, "FROZEN_PREFIXES") and "vqvae_model_config" in config:
        from speech_masters_thesis_tpu.models.transformer_lm.model import load_vqvae_into_variables
        variables = load_vqvae_into_variables(
            variables, config.model.vqvae.log_dir, config.model.vqvae.ckpt_num)
        logger.info("Loaded frozen VQ-VAE from %s (ckpt %s)",
                    config.model.vqvae.log_dir, config.model.vqvae.ckpt_num)
    return variables


def frozen_param_mask(model, params):
    """Pytree mask: False for parameter subtrees frozen by the model."""
    prefixes = getattr(model, "FROZEN_PREFIXES", ())
    if not prefixes:
        return None
    import jax
    return {
        top: jax.tree.map(lambda _: top not in prefixes, sub)
        for top, sub in params.items()
    }


def init_model_variables(model, config, rng: jax.Array) -> dict:
    """Initializes params + mutable collections on a model-shaped dummy batch.

    flax's Module.init traces EAGERLY (one tiny XLA program per op — minutes
    of compile time on this host); wrapping it in jit compiles one program.
    """
    batch = model.dummy_batch(config)
    rng_p, rng_d, rng_c = jax.random.split(rng, 3)

    @jax.jit
    def _init(rngs, batch):
        return model.init(rngs, batch, train=False, method=model.supervised_step)

    variables = _init({"params": rng_p, "dropout": rng_d, "codebook": rng_c}, batch)
    return dict(variables)


def get_dataloaders(config, shard_count: int = 1, shard_index: int = 0) -> Tuple[DataLoader, DataLoader]:
    """Train/val loaders (reference utils/commons.py:67-117).

    Multi-host training does NOT shard here: every process loads the same
    global batch (same seed => same permutation) and the per-process slice is
    taken at device placement (parallel/mesh.py:shard_batch), which keeps all
    processes in SPMD lockstep with identical bucketed shapes. The
    shard_count/shard_index args remain for genuinely independent consumers
    (scripts/generate_vq_dataset.py splits the corpus across workers).

    The val loader keeps the final partial batch (pad_last=False) — the
    reference evaluates partial batches too, and wrap-padding would
    double-count val items in the epoch averages. Under multi-process SPMD
    the partial batch must still be wrap-padded (all processes must present
    identical global shapes), so pad_last flips back on there; the val-metric
    bias is documented in that mode.
    """
    import jax

    num_workers = int(config.train.get("num_workers", 0) or 0)
    multiprocess = jax.process_count() > 1
    dataset_cls = resolve_dataset(config.dataset["_import_"])
    train_loader = DataLoader(
        dataset_cls(config, split="train"),
        batch_size=config.train.batch_size,
        shuffle=True,
        seed=config.train.seed,
        shard_count=shard_count,
        shard_index=shard_index,
        num_workers=num_workers,
    )
    val_loader = DataLoader(
        dataset_cls(config, split="val"),
        batch_size=config.train.batch_size,
        shuffle=False,
        pad_last=multiprocess,
        num_workers=num_workers,
    )
    return train_loader, val_loader


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def print_top_level_summary(model, variables) -> None:
    """Per-submodule parameter table (reference train_utils.py:90-117)."""
    params = variables.get("params", {})
    rows = []
    for name, sub in params.items():
        rows.append((name, count_params(sub)))
    total = count_params(params)
    buffers = sum(count_params(v) for k, v in variables.items() if k != "params")
    width = max([len(r[0]) for r in rows] + [10])
    lines = [f"{'Name':<{width}}  Params"]
    lines += [f"{name:<{width}}  {n:,}" for name, n in rows]
    lines += [f"{'TOTAL':<{width}}  {total:,} params, {buffers:,} buffer elements"]
    print("\n".join(lines))
