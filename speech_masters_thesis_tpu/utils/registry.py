"""Component registry: maps ``_import_`` strings to TPU-native classes.

The reference resolves ``config.model._import_`` / ``config.dataset._import_``
with ``importlib`` (reference: utils/commons.py:28-29,76-77). Here the same
config strings remain valid — reference YAML configs are drop-in — but they
resolve through an explicit table to this framework's implementations, and
new-style short names (``vqvae``, ``ljspeech``) are accepted too.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_MODEL_PATHS: Dict[str, str] = {
    # reference import paths -> (module, attr) in this package
    "models.vqvae.vqvae.VQVAE": "speech_masters_thesis_tpu.models.vqvae.model:VQVAE",
    "models.glow_tts.glow_tts.GlowTTS": "speech_masters_thesis_tpu.models.glow_tts.model:GlowTTS",
    "models.transformer_lm.transformer_lm.TransformerLM":
        "speech_masters_thesis_tpu.models.transformer_lm.model:TransformerLM",
    "models.vqtts.vqtts.VQTTS": "speech_masters_thesis_tpu.models.vqtts.model:VQTTS",
    # short names
    "vqvae": "speech_masters_thesis_tpu.models.vqvae.model:VQVAE",
    "glow_tts": "speech_masters_thesis_tpu.models.glow_tts.model:GlowTTS",
    "transformer_lm": "speech_masters_thesis_tpu.models.transformer_lm.model:TransformerLM",
    "vqtts": "speech_masters_thesis_tpu.models.vqtts.model:VQTTS",
}

_DATASET_PATHS: Dict[str, str] = {
    "datasets.ljspeech.LJSpeech": "speech_masters_thesis_tpu.data.ljspeech:LJSpeech",
    "datasets.vqlatent.VQLatent": "speech_masters_thesis_tpu.data.vqlatent:VQLatent",
    "ljspeech": "speech_masters_thesis_tpu.data.ljspeech:LJSpeech",
    "vqlatent": "speech_masters_thesis_tpu.data.vqlatent:VQLatent",
}


def _resolve(table: Dict[str, str], key: str) -> Any:
    if key not in table:
        raise KeyError(f"Unknown component '{key}'. Known: {sorted(table)}")
    module_name, attr = table[key].split(":")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def resolve_model(import_path: str) -> Callable[..., Any]:
    return _resolve(_MODEL_PATHS, import_path)


def resolve_dataset(import_path: str) -> Callable[..., Any]:
    return _resolve(_DATASET_PATHS, import_path)
