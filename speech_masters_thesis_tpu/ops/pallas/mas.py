"""Monotonic alignment search as a single Pallas TPU kernel.

One kernel fuses the whole Viterbi DP (forward pass + backtrack): the DP
state never round-trips to HBM between the two passes. The kernel is
batch-vectorized: every DP step operates on a [B, t_x] tile (batch in
sublanes, tokens in lanes), so the sequential t_y loop runs once for the
whole batch — the same vectorization the lax.scan formulation gets, plus
fusion of the backtrack and the direction buffer staying in VMEM.

Layout: inputs are transposed to time-major [t_y, B, t_x] so each step reads
one contiguous [B, t_x] slab.

Reference semantics: models/glow_tts/submodules.py:28-67 (see ops/mas.py and
the numpy oracle there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_NEG = -1e9


def _mas_kernel(value_ref, mask_ref, path_ref, dir_scratch, v_scratch):
    """Refs: value/mask/path [t_y, B, t_x] VMEM; dir [t_y, B, t_x]; v [B, t_x]."""
    t_y, b, t_x = value_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, t_x), 1).astype(jnp.float32)

    # ---- forward DP over frames (whole batch per step) -------------------------
    v_scratch[...] = jnp.zeros((b, t_x), jnp.float32)

    def forward(j, _):
        v = v_scratch[...]
        value_row = value_ref[j] * mask_ref[j]  # [B, t_x]
        v0 = pltpu.roll(v, 1, axis=1)
        v0 = jnp.where(lane == 0, _MAX_NEG, v0)
        stay = (v >= v0).astype(jnp.float32)
        v_max = jnp.maximum(v, v0)
        index_mask = lane <= j.astype(jnp.float32)
        v_scratch[...] = jnp.where(index_mask, v_max + value_row, _MAX_NEG)
        dir_scratch[j] = stay
        return 0

    jax.lax.fori_loop(0, t_y, forward, 0)

    # ---- backtrack (per-batch running index as a [B, 1] lane vector) -----------
    start = jnp.sum(mask_ref[0], axis=1, keepdims=True) - 1.0  # [B, 1]

    def backward(i, idx):
        j = t_y - 1 - i
        onehot = (lane == idx).astype(jnp.float32)  # [B, t_x]
        mask_row = mask_ref[j]
        path_ref[j] = onehot * mask_row
        dir_row = jnp.where(mask_row > 0, dir_scratch[j], 1.0)
        step = jnp.sum(dir_row * onehot, axis=1, keepdims=True)  # [B, 1]
        return idx + step - 1.0

    jax.lax.fori_loop(0, t_y, backward, start)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(value: jnp.ndarray, mask: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.mas.maximum_path ([b, t_x, t_y] layout)."""
    b, t_x, t_y = value.shape
    value_t = jnp.transpose(value.astype(jnp.float32), (2, 0, 1))  # [t_y, B, t_x]
    mask_t = jnp.transpose(mask.astype(jnp.float32), (2, 0, 1))

    path_t = pl.pallas_call(
        _mas_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_y, b, t_x), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_y, b, t_x), jnp.float32),
            pltpu.VMEM((b, t_x), jnp.float32),
        ],
        interpret=interpret,
    )(value_t, mask_t)
    return jnp.transpose(path_t, (1, 2, 0))
