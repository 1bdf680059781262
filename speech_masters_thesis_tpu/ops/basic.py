"""Numeric primitives shared across models (pure jnp, jit-safe, static shapes).

TPU-native counterparts of the reference's L0 layer:
  * ``safe_log``        — reference utils/torch_utils.py:4-5
  * ``sequence_mask``   — reference models/glow_tts/submodules.py:18-25
  * ``generate_path``   — reference models/glow_tts/submodules.py:70-85

All functions take explicit ``max_length`` so shapes stay static under jit
(the reference derives max_length from data at runtime, which would retrace).
Layout convention is NTC (batch, time, channels): time in sublanes, channels
in lanes, so the feature axis maps onto the TPU's 128-wide vector lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_log(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """log(max(x, eps)); clamps to avoid -inf on silence/zero bins."""
    return jnp.log(jnp.clip(x, min=eps))


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a zero (not NaN/inf) gradient at x == 0.

    d/dx sqrt(x) -> inf as x -> 0; masked losses multiply that by a zero mask
    and 0 * inf = NaN poisons the whole gradient. The double-where trick keeps
    the forward value bit-exact while zeroing the cotangent at x == 0
    (exact-zero spectral bins occur for constant/silent frames).
    """
    positive = x > 0
    guarded = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(guarded), 0.0)


@jax.custom_vjp
def softmax_f32(logits: jnp.ndarray) -> jnp.ndarray:
    """Last-axis softmax that reduces in f32 but MATERIALIZES in the input
    dtype (probs forward, probs residual for backward, grads).

    Why it exists: for a bf16 [B, H, T, T] attention-logits tensor, plain
    ``jax.nn.softmax(logits.astype(f32))`` makes autodiff save the f32 probs
    as the VJP residual — doubling the HBM footprint/traffic of the biggest
    tensor in a transformer train step. Here the residual is the bf16 probs;
    the backward recomputes in f32 from them. For f32 inputs this is exactly
    jax.nn.softmax.
    """
    out = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return out.astype(logits.dtype)


def _softmax_f32_fwd(logits):
    out = softmax_f32(logits)
    return out, out


def _softmax_f32_bwd(probs, g):
    p = probs.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    ds = p * (gf - jnp.sum(gf * p, axis=-1, keepdims=True))
    return (ds.astype(probs.dtype),)


softmax_f32.defvjp(_softmax_f32_fwd, _softmax_f32_bwd)


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[b] lengths -> [b, max_length] float32 mask (1 inside, 0 in padding)."""
    positions = jnp.arange(max_length, dtype=lengths.dtype)
    return (positions[None, :] < lengths[:, None]).astype(jnp.float32)


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Expands per-token durations into a hard monotonic alignment matrix.

    duration: [b, t_x] (float or int counts of frames per token)
    mask:     [b, t_x, t_y]
    returns:  [b, t_x, t_y] 0/1 path

    Same cumsum-difference construction as the reference
    (models/glow_tts/submodules.py:70-85): row i covers frames
    [cumdur[i-1], cumdur[i]).
    """
    b, t_x, t_y = mask.shape
    cum_duration = jnp.cumsum(duration, axis=1)  # [b, t_x]
    frame = jnp.arange(t_y, dtype=cum_duration.dtype)
    # path_upper[i, j] = 1 if j < cumdur[i]
    path_upper = (frame[None, None, :] < cum_duration[:, :, None]).astype(mask.dtype)
    path_lower = jnp.pad(path_upper, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return (path_upper - path_lower) * mask


def lengths_from_mask(mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sum(mask, axis=axis)
