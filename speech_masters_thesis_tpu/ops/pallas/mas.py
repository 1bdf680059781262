"""Monotonic alignment search as a single Pallas TPU kernel.

One kernel fuses the whole Viterbi DP (forward pass + backtrack) per batch
element: the DP table never round-trips to HBM between the two passes (the
lax.scan formulation in ops/mas.py materializes the [b, t_x, t_y] direction
tensor in HBM and re-reads it backwards). Grid = (batch,); all state lives
in VMEM scratch.

Layout: time-major [t_y, t_x] inside the kernel so every DP step reads one
contiguous (1, t_x) lane vector; the wrapper transposes from/to the
[b, t_x, t_y] convention of ops/mas.py.

Reference semantics: models/glow_tts/submodules.py:28-67 (see ops/mas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_NEG = -1e9


def _mas_kernel(value_ref, mask_ref, path_ref, dir_scratch):
    """value_ref/mask_ref/path_ref: [1, t_y, t_x] blocks; dir_scratch: [t_y, t_x]."""
    t_y = value_ref.shape[1]
    t_x = value_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.float32, (1, t_x), 1)

    # ---- forward DP over frames ------------------------------------------------
    def forward(j, v):
        value_row = value_ref[0, pl.ds(j, 1), :] * mask_ref[0, pl.ds(j, 1), :]  # [1, t_x]
        v0 = pltpu.roll(v, 1, axis=1)
        v0 = jnp.where(lane == 0, _MAX_NEG, v0)
        stay = (v >= v0).astype(jnp.float32)
        v_max = jnp.maximum(v, v0)
        index_mask = lane <= j.astype(jnp.float32)
        v_next = jnp.where(index_mask, v_max + value_row, _MAX_NEG)
        dir_scratch[pl.ds(j, 1), :] = stay
        return v_next

    v0 = jnp.zeros((1, t_x), jnp.float32)
    jax.lax.fori_loop(0, t_y, forward, v0)

    # ---- backtrack --------------------------------------------------------------
    # start at the last valid token (mask row 0 counts valid tokens)
    start = jnp.sum(mask_ref[0, pl.ds(0, 1), :]).astype(jnp.float32) - 1.0

    def backward(i, idx):
        j = t_y - 1 - i
        onehot = (lane == idx).astype(jnp.float32)  # [1, t_x]
        mask_row = mask_ref[0, pl.ds(j, 1), :]
        path_ref[0, pl.ds(j, 1), :] = onehot * mask_row
        dir_row = dir_scratch[pl.ds(j, 1), :]
        # outside the valid region behave like "stay" (reference :57)
        dir_row = jnp.where(mask_row > 0, dir_row, 1.0)
        step = jnp.sum(dir_row * onehot)
        return idx + step - 1.0

    jax.lax.fori_loop(0, t_y, backward, start)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(value: jnp.ndarray, mask: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.mas.maximum_path ([b, t_x, t_y] layout)."""
    b, t_x, t_y = value.shape
    value_t = jnp.swapaxes(value.astype(jnp.float32), 1, 2)  # [b, t_y, t_x]
    mask_t = jnp.swapaxes(mask.astype(jnp.float32), 1, 2)

    path_t = pl.pallas_call(
        _mas_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_y, t_x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_y, t_x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_y, t_x), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_y, t_x), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t_y, t_x), jnp.float32)],
        interpret=interpret,
    )(value_t, mask_t)
    return jnp.swapaxes(path_t, 1, 2)
