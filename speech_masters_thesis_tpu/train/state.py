"""Train state pytree: params + mutable model collections + optimizer + EMA.

Replaces the reference's implicit state scattered across torch modules,
optimizer, scheduler, GradScaler and EMA objects (reference train.py:82-143)
with one immutable pytree threaded through a jitted step function.
``model_state`` carries every non-param flax collection (e.g. the VQ
``codebook``), so codebook updates are ordinary functional state transitions
inside the compiled step.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    model_state: Any          # dict of non-param variable collections
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation,
               use_ema: bool = False) -> "TrainState":
        import jax.numpy as jnp

        from speech_masters_thesis_tpu.models.ema import init_ema
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state,
            opt_state=tx.init(params),
            ema_params=init_ema(params) if use_ema else None,
        )
