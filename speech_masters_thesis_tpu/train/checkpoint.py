"""Orbax checkpointing: save/restore the full TrainState + counters.

Rebuild of reference utils/train_utils.py:148-171 (monolithic torch.save of
{config, model, optim, sched, ema, step, epoch}). Orbax gives atomic,
async-capable, multi-host-safe checkpoints and TPU preemption resume. The
directory layout mirrors the reference (log_dir/ckpts/ckpt.{step|last}) so
cross-program checkpoint pointers (TransformerLM's vqvae.log_dir +
ckpt_num, reference transformer_lm.py:85-99) keep working.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from speech_masters_thesis_tpu.train.state import TrainState

logger = logging.getLogger(__name__)


def ckpt_dir(log_dir: str, step_or_last) -> str:
    return os.path.join(os.path.abspath(log_dir), "ckpts", f"ckpt.{step_or_last}")


# resumed training must keep the PRNG implementation it started with — a
# silent threefry<->rbg switch changes every dropout/revival stream mid-run
_PRNG_IMPL_IDS = {"threefry": 0, "rbg": 1, "unsafe_rbg": 2}


def _current_prng_impl() -> str:
    impl = str(jax.config.jax_default_prng_impl)
    if impl == "threefry2x32":  # jax's enum name for the default impl
        impl = "threefry"
    return impl if impl in _PRNG_IMPL_IDS else "threefry"


def save_checkpoint(config, global_step: int, epoch: int, state: TrainState) -> str:
    """epoch == -1 saves as 'last' (reference save_checkpoint semantics)."""
    tag = "last" if epoch == -1 else global_step
    path = ckpt_dir(config.train.log_dir, tag)
    payload = {
        "state": jax.device_get(state),
        "step": global_step,
        "epoch": config.train.total_epochs if epoch == -1 else epoch,
        # stored as an int id (orbax pytrees hold arrays, not strings)
        "prng_impl_id": _PRNG_IMPL_IDS[_current_prng_impl()],
    }
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, payload, force=True)
    logger.info("Saved checkpoint to %s", path)
    return path


def _stored_keys(checkpointer: "ocp.PyTreeCheckpointer", path: str):
    """Top-level keys of a saved checkpoint tree, or None if the orbax
    metadata object matches no known shape (API drift) — the caller must
    then assume the current format rather than silently dropping keys
    (an empty-set fallback would skip the prng-impl guard entirely)."""
    meta = checkpointer.metadata(os.path.abspath(path))
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", None)
    if tree is None:  # older orbax: metadata IS the tree
        tree = meta
    return set(tree.keys()) if hasattr(tree, "keys") else None


def restore_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int, int]:
    """Restores into the structure of ``state`` (created fresh from config).

    Raises if the checkpoint records a different PRNG implementation than the
    active one (--prng_impl): resuming under a different impl silently changes
    the dropout/revival random streams mid-run.
    """
    checkpointer = ocp.PyTreeCheckpointer()
    template = {"state": jax.device_get(state), "step": 0, "epoch": 0,
                "prng_impl_id": 0}
    # Probe the stored structure instead of try/except-retrying: a genuinely
    # corrupt checkpoint then surfaces its real error, and pre-round-3
    # checkpoints (no prng_impl_id) restore cleanly without the impl check.
    # Unknown metadata shape (None) => keep the key: current-format
    # checkpoints stay restorable and the impl guard stays armed; only a
    # provably key-less (old-format) checkpoint drops it.
    stored = _stored_keys(checkpointer, path)
    if stored is not None and "prng_impl_id" not in stored:
        template.pop("prng_impl_id")
    payload = checkpointer.restore(os.path.abspath(path), item=template)
    if "prng_impl_id" in payload:
        saved_id = int(payload["prng_impl_id"])
        current = _current_prng_impl()
        if saved_id != _PRNG_IMPL_IDS[current]:
            names = {v: k for k, v in _PRNG_IMPL_IDS.items()}
            raise RuntimeError(
                f"Checkpoint {path} was trained with --prng_impl "
                f"{names.get(saved_id, saved_id)} but the current run uses "
                f"{current}; resume with the same --prng_impl.")
    restored = payload["state"]
    if not isinstance(restored, TrainState):
        restored = TrainState(**restored)
    return restored, int(payload["step"]), int(payload["epoch"])


def restore_collections(path: str, template: dict) -> dict:
    """Restores just {params, model_state} for cross-program consumers
    (e.g. TransformerLM loading a frozen VQ-VAE)."""
    checkpointer = ocp.PyTreeCheckpointer()
    payload = checkpointer.restore(os.path.abspath(path))
    state = payload["state"]
    return {"params": state["params"], **state["model_state"]}


def latest_checkpoint(log_dir: str) -> Optional[str]:
    root = os.path.join(log_dir, "ckpts")
    if not os.path.isdir(root):
        return None
    entries = [d for d in os.listdir(root) if d.startswith("ckpt.")]
    if not entries:
        return None
    def key(name):
        tag = name.split(".", 1)[1]
        return (1, 0) if tag == "last" else (0, int(tag))
    entries.sort(key=key)
    return os.path.join(root, entries[-1])
