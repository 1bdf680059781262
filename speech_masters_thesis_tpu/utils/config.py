"""Hierarchical YAML config system.

TPU-native replacement for the reference's OmegaConf usage
(reference: train.py:516-545, utils/commons.py:28-29, utils/commons.py:171-184).
Provides the same three capabilities the reference relies on:

  * attribute-style access with nesting (``config.model.emb_width``)
  * deep merge of several YAML sources (model + dataset + train dict)
  * round-trip save/load of the merged config to ``log_dir/config.yaml``

plus ``_import_``-style component binding, which here resolves through an
explicit registry (see utils/registry.py) instead of ``importlib`` so the
mapping from reference import paths to TPU implementations stays auditable.
"""

from __future__ import annotations

import copy
import io
import os
from typing import Any, Dict, Mapping, Optional

import yaml


class Config(dict):
    """A dict with attribute access, deep merge, and YAML round-trip.

    Nested mappings are recursively wrapped so ``cfg.a.b.c`` works. Missing
    keys raise ``AttributeError`` (mirroring OmegaConf's strict access);
    ``cfg.get(key, default)`` is available for optional lookups.
    """

    def __init__(self, data: Optional[Mapping[str, Any]] = None):
        super().__init__()
        if data:
            for key, value in data.items():
                self[key] = value

    # -- attribute protocol -------------------------------------------------
    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, _wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    # -- merge / copy --------------------------------------------------------
    def merge(self, *others: Mapping[str, Any]) -> "Config":
        """Returns a new Config with ``others`` deep-merged on top of self.

        Later sources win on conflicts, matching
        ``OmegaConf.merge(model, dataset, train)`` (reference train.py:545).
        """
        out = copy.deepcopy(self)
        for other in others:
            _deep_merge(out, other)
        return out

    def to_dict(self) -> Dict[str, Any]:
        return _unwrap(self)

    def copy(self) -> "Config":  # type: ignore[override]
        return copy.deepcopy(self)

    def __deepcopy__(self, memo) -> "Config":
        new = Config()
        for key, value in self.items():
            dict.__setitem__(new, key, copy.deepcopy(value, memo))
        return new

    # -- yaml ---------------------------------------------------------------
    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def save(self, path: str) -> None:
        with io.open(path, "w", encoding="utf-8") as f:
            f.write(self.to_yaml())


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config(value)
    if isinstance(value, (list, tuple)):
        return [_wrap(v) for v in value]
    return value


def _unwrap(value: Any) -> Any:
    if isinstance(value, Mapping):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_unwrap(v) for v in value]
    return value


def _deep_merge(dst: Config, src: Mapping[str, Any]) -> None:
    for key, value in src.items():
        if key in dst and isinstance(dst[key], Mapping) and isinstance(value, Mapping):
            _deep_merge(dst[key], value)
        else:
            dst[key] = value


_SCI_FLOAT = __import__("re").compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _resolve_scalars(value: Any) -> Any:
    """pyyaml leaves exponent-form numbers without a dot ('1e-9') as strings;
    coerce them to float (OmegaConf-compatible behavior)."""
    if isinstance(value, str) and _SCI_FLOAT.match(value):
        return float(value)
    if isinstance(value, Mapping):
        return {k: _resolve_scalars(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_scalars(v) for v in value]
    return value


def load_config(path: str) -> Config:
    with io.open(path, "r", encoding="utf-8") as f:
        data = yaml.safe_load(f)
    return Config(_resolve_scalars(data or {}))


def merge_configs(*configs: Mapping[str, Any]) -> Config:
    base = Config()
    return base.merge(*configs)


def load_merged(model_yaml: str, dataset_yaml: str, train_overrides: Mapping[str, Any]) -> Config:
    """Three-source merge identical in precedence to reference train.py:516-545."""
    return merge_configs(load_config(model_yaml), load_config(dataset_yaml), Config(train_overrides))


def setup_logdir(config: Config) -> None:
    """Creates log_dir layout (ckpts/spect/audio) and dumps the merged config.

    Mirrors reference utils/commons.py:171-184 so downstream programs
    (scripts, checkpoint consumers) find the same files.
    """
    log_dir = config.train.log_dir
    os.makedirs(log_dir, exist_ok=True)
    for sub in ("ckpts", "spect", "audio"):
        os.makedirs(os.path.join(log_dir, sub), exist_ok=True)
    config.save(os.path.join(log_dir, "config.yaml"))
