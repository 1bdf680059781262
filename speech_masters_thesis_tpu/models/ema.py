"""Exponential moving average of parameters as a pure pytree transform.

Rebuild of reference models/ema.py:11-66. The reference keeps a mutable
shadow copy and swaps tensors in-place around validation; functionally the
EMA is just a second params pytree updated inside the jitted train step, and
"swap" becomes *evaluating with the EMA pytree* — no copies.

``mu`` defaults follow reference utils/commons.py:62:
mu = 1 - batch_size * n_devices / 1000.
"""

from __future__ import annotations

from typing import Any, Optional

import jax


def init_ema(params: Any) -> Any:
    # materialize distinct buffers: the shadow must not alias the live params
    # (aliasing breaks argument donation in the jitted train step)
    import jax.numpy as jnp
    return jax.tree.map(jnp.array, params)


def ema_step(ema_params: Any, params: Any, mu: float) -> Any:
    return jax.tree.map(lambda e, p: e * mu + (1.0 - mu) * p, ema_params, params)


def default_mu(batch_size: int, n_devices: int) -> float:
    return 1.0 - (batch_size * n_devices / 1000.0)


def eval_params(params: Any, ema_params: Optional[Any], use_ema: bool) -> Any:
    """Parameters to use for validation: EMA shadow when tracking is enabled."""
    return ema_params if (use_ema and ema_params is not None) else params
