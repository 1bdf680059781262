"""Monotonic alignment search as a single Pallas TPU kernel.

One kernel fuses the whole Viterbi DP (forward pass + backtrack): the DP
state never round-trips to HBM between the two passes. The kernel is
batch-vectorized: every DP step operates on a [B, t_x] tile (batch in
sublanes, tokens in lanes), so the sequential t_y loop runs once for the
whole batch — the same vectorization the lax.scan formulation gets, plus
fusion of the backtrack and the direction buffer staying in VMEM.

Layout: inputs are transposed to time-major [t_y, B, t_x] so each step reads
one contiguous [B, t_x] slab.

Sequential-depth note (SURVEY §7 option b, "scan anti-diagonals"): the MAS
recurrence v[j, i] = value[j, i] + max(v[j-1, i], v[j-1, i-1]) depends ONLY
on the previous frame row, so whole rows are already parallel — this kernel's
serial depth is t_y with a full [B, t_x] vector op per step. An anti-diagonal
wavefront (the right shape for DPs with a same-row left-neighbor dependency,
e.g. edit distance) would serialize t_x + t_y - 1 steps over strided
diagonal vectors: strictly deeper AND unaligned lane access. The measured
lever is instead per-step loop overhead, amortized by unrolling ``unroll``
rows per loop iteration with one multi-row VMEM slab load/store each
(A/B ladder in BASELINE.md).

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


def _mas_kernel(unroll, value_ref, mask_ref, path_ref, dir_scratch, v_scratch):
    """Refs: value/mask/path [t_y, B, t_x] VMEM; dir [t_y, B, t_x]; v [B, t_x].

    ``unroll`` rows are processed per loop iteration: one slab read of the
    value/mask rows, one slab write of the direction/path rows, and the
    row-to-row DP carried in registers inside the unrolled body.
    """
    t_y, b, t_x = value_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, t_x), 1).astype(jnp.float32)
    n_main, rem = divmod(t_y, unroll)

    # ---- forward DP over frames (whole batch per step) -------------------------
    v_scratch[...] = jnp.zeros((b, t_x), jnp.float32)

    def _fwd_row(v, value_row, jf):
        """One DP step: returns (v_next, stay)."""
        v0 = pltpu.roll(v, 1, axis=1)
        v0 = jnp.where(lane == 0, _MAX_NEG, v0)
        stay = (v >= v0).astype(jnp.float32)
        v_max = jnp.maximum(v, v0)
        index_mask = lane <= jf
        v_next = jnp.where(index_mask, v_max + value_row, _MAX_NEG)
        return v_next, stay

    def forward_block(jb, _):
        j0 = jb * unroll
        vals = value_ref[pl.ds(j0, unroll)] * mask_ref[pl.ds(j0, unroll)]
        j0f = j0.astype(jnp.float32)
        v = v_scratch[...]
        stays = []
        for k in range(unroll):
            v, stay = _fwd_row(v, vals[k], j0f + float(k))
            stays.append(stay)
        v_scratch[...] = v
        dir_scratch[pl.ds(j0, unroll)] = jnp.stack(stays)
        return 0

    jax.lax.fori_loop(0, n_main, forward_block, 0)
    for k in range(rem):  # static tail rows
        j = n_main * unroll + k
        v, stay = _fwd_row(v_scratch[...], value_ref[j] * mask_ref[j], float(j))
        v_scratch[...] = v
        dir_scratch[j] = stay

    # ---- backtrack (per-batch running index as a [B, 1] lane vector) -----------
    idx0 = jnp.sum(mask_ref[0], axis=1, keepdims=True) - 1.0  # [B, 1]

    def _bwd_row(idx, mask_row, dir_row):
        """One backtrack step: returns (path_row, idx_prev)."""
        onehot = (lane == idx).astype(jnp.float32)  # [B, t_x]
        path_row = onehot * mask_row
        d = jnp.where(mask_row > 0, dir_row, 1.0)
        step = jnp.sum(d * onehot, axis=1, keepdims=True)  # [B, 1]
        return path_row, idx + step - 1.0

    idx = idx0
    for k in range(rem):  # static head rows (largest j first)
        j = t_y - 1 - k
        path_row, idx = _bwd_row(idx, mask_ref[j], dir_scratch[j])
        path_ref[j] = path_row

    def backward_block(ib, idx):
        j0 = (n_main - 1 - ib) * unroll
        masks = mask_ref[pl.ds(j0, unroll)]
        dirs = dir_scratch[pl.ds(j0, unroll)]
        rows = [None] * unroll
        for k in reversed(range(unroll)):
            rows[k], idx = _bwd_row(idx, masks[k], dirs[k])
        path_ref[pl.ds(j0, unroll)] = jnp.stack(rows)
        return idx

    jax.lax.fori_loop(0, n_main, backward_block, idx)


@functools.partial(jax.jit, static_argnames=("interpret", "unroll"))
def maximum_path_pallas(value: jnp.ndarray, mask: jnp.ndarray,
                        interpret: bool = False, unroll: int = 8) -> jnp.ndarray:
    """Drop-in replacement for ops.mas.maximum_path ([b, t_x, t_y] layout)."""
    b, t_x, t_y = value.shape
    unroll = max(1, min(unroll, t_y))
    value_t = jnp.transpose(value.astype(jnp.float32), (2, 0, 1))  # [t_y, B, t_x]
    mask_t = jnp.transpose(mask.astype(jnp.float32), (2, 0, 1))

    path_t = pl.pallas_call(
        functools.partial(_mas_kernel, unroll),
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
