"""Optimizers and LR schedules (optax).

Rebuild of reference utils/commons.py:120-168 (AdamW/SGD factory) and
utils/lr_scheduler.py:7-38 (Dummy/LinearWarmup/Noam), plus torch
CosineAnnealingLR. Schedule formulas use step+1 to match the reference's
``last_epoch + 1`` convention, so the LR at optimizer update k equals the
reference's LR at its k-th step exactly.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import optax


def dummy_schedule(base_lr: float) -> Callable:
    return lambda count: base_lr


def linear_warmup_schedule(base_lr: float, warmup_steps: int) -> Callable:
    def schedule(count):
        step = count + 1
        return base_lr * jnp.minimum(step / warmup_steps, 1.0)
    return schedule


def noam_schedule(base_lr: float, dim_model: int, warmup_steps: int) -> Callable:
    def schedule(count):
        step = (count + 1).astype(jnp.float32) if hasattr(count, "astype") else float(count + 1)
        return base_lr * dim_model ** (-0.5) * jnp.minimum(step ** (-0.5), step * warmup_steps ** (-1.5))
    return schedule


def cosine_schedule(base_lr: float, total_steps: int, eta_min: float = 0.0) -> Callable:
    def schedule(count):
        step = count + 1
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * step / total_steps)) / 2
    return schedule


def build_schedule(config) -> Callable:
    base_lr = config.optimizer.lr
    sched_cfg = config.get("scheduler", None)
    if not sched_cfg:
        return dummy_schedule(base_lr)
    name = sched_cfg["name"]
    if name == "noam":
        # The reference reads config.model.d_model unconditionally
        # (utils/commons.py:152), but its own glow_tts.yaml has no d_model —
        # a latent crash. Fall back to the encoder width for such configs.
        dim_model = config.model.get("d_model")
        if dim_model is None:
            dim_model = config.model.encoder.hidden_channels
        return noam_schedule(base_lr, dim_model, sched_cfg["warmup_steps"])
    if name == "linear":
        return linear_warmup_schedule(base_lr, sched_cfg["warmup_steps"])
    if name == "cosine":
        # torch CosineAnnealingLR needs a horizon (T_max). Accept it from
        # scheduler.total_steps or train.total_steps; fail fast with a clear
        # message instead of crashing mid-run on a missing key.
        total_steps = sched_cfg.get("total_steps") or config.train.get("total_steps")
        if not total_steps:
            raise ValueError(
                "scheduler: cosine requires `scheduler.total_steps` (or "
                "`train.total_steps`) — the annealing horizon T_max. Add it "
                "to the model YAML or pass --total_steps.")
        return cosine_schedule(base_lr, int(total_steps))
    raise ValueError(f"Didn't recognize scheduler name {name}")


def build_optimizer(config, grad_clip_norm: Optional[float] = None,
                    frozen_mask=None) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (optax transform, schedule fn for logging).

    ``frozen_mask`` (pytree of bools, False = frozen) excludes subtrees such
    as the LM's grafted VQ-VAE from updates — the reference relies on those
    params never receiving gradients (transformer_lm.py:101-108); with optax
    an explicit mask also shields them from weight decay.
    """
    schedule = build_schedule(config)
    opt_cfg = config.optimizer
    if opt_cfg.name == "adam":
        tx = optax.adamw(
            learning_rate=schedule,
            b1=opt_cfg.betas[0],
            b2=opt_cfg.betas[1],
            eps=opt_cfg.eps,
            weight_decay=opt_cfg.weight_decay,
        )
    elif opt_cfg.name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(opt_cfg.weight_decay) if opt_cfg.weight_decay else optax.identity(),
            optax.sgd(learning_rate=schedule, momentum=opt_cfg.momentum),
        )
    else:
        raise ValueError(f"Didn't recognize optimizer name {opt_cfg.name}")

    if grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if frozen_mask is not None:
        tx = optax.masked(tx, frozen_mask)
    return tx, schedule
