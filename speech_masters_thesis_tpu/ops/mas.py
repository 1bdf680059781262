"""Monotonic Alignment Search (MAS) — on-device Viterbi DP.

The reference deliberately runs MAS in NumPy on the CPU, forcing a
device->host->device round trip on every training step
(reference models/glow_tts/submodules.py:28-67, called from
glow_tts.py:97 and vqtts.py:137). Here the same dynamic program runs
on-device as two ``lax.scan`` passes (forward DP over t_y, reverse
backtrack), vectorized across batch and t_x on the VPU — sequential depth
is O(t_y) but each step is an 8x128-wide vector op and nothing leaves HBM.

The reference-semantics NumPy oracle lives in tests/oracles.py (test-only).

Semantics (matching the reference exactly):
  value: [b, t_x, t_y] log-likelihood of aligning token i to frame j
  mask:  [b, t_x, t_y] valid region (t_x_valid x t_y_valid per sample)
  returns a 0/1 path of the same shape: monotone, surjective over valid
  frames, path[i, j] = 1 iff frame j is assigned to token i.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MAX_NEG = -1e9


def maximum_path(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """On-device MAS. value, mask: [b, t_x, t_y] -> path [b, t_x, t_y]."""
    value = (value * mask).astype(jnp.float32)
    b, t_x, t_y = value.shape
    x_range = jnp.arange(t_x, dtype=jnp.float32)[None, :]  # [1, t_x]

    # Forward DP over frames: carry the best cumulative score per token row.
    def forward(v, inputs):
        value_col, j = inputs  # [b, t_x], scalar
        v0 = jnp.pad(v, ((0, 0), (1, 0)), constant_values=_MAX_NEG)[:, :-1]
        stay = v >= v0  # True: best predecessor is same token; False: token-1
        v_max = jnp.where(stay, v, v0)
        index_mask = x_range <= j.astype(jnp.float32)
        v_next = jnp.where(index_mask, v_max + value_col, _MAX_NEG)
        return v_next, stay

    value_cols = jnp.moveaxis(value, 2, 0)  # [t_y, b, t_x]
    steps = jnp.arange(t_y)
    _, stay = jax.lax.scan(forward, jnp.zeros((b, t_x), jnp.float32), (value_cols, steps))
    direction = jnp.moveaxis(stay, 0, 2)  # [b, t_x, t_y] bool
    # Outside the valid region, pretend "stay" so backtracking idles at the
    # final valid token until j drops into the valid frame range.
    direction = jnp.where(mask > 0, direction, True).astype(jnp.int32)

    # Reverse backtrack: walk from the last valid (token, frame) corner.
    start_index = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32) - 1  # [b]

    def backward(index, direction_col):
        path_col = jax.nn.one_hot(index, t_x, dtype=jnp.float32)  # [b, t_x]
        step = jnp.take_along_axis(direction_col, index[:, None], axis=1)[:, 0]
        return index + step - 1, path_col

    direction_cols = jnp.moveaxis(direction, 2, 0)  # [t_y, b, t_x]
    _, path_cols = jax.lax.scan(backward, start_index, direction_cols, reverse=True)
    path = jnp.moveaxis(path_cols, 0, 2)  # [b, t_x, t_y]
    return path * mask


def maximum_path_auto(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MAS with backend dispatch: the fused Pallas kernel on TPU (measured
    1.77x faster than the scan at b8 x 256 x 1024 and bitwise-identical,
    benchmarks/results.json "mas"), lax.scan elsewhere (CPU tests run the
    Pallas kernel separately in interpret mode)."""
    if jax.default_backend() in ("tpu", "axon"):
        from speech_masters_thesis_tpu.ops.pallas.mas import maximum_path_pallas

        return maximum_path_pallas(value, mask)
    return maximum_path(value, mask)


def mas_log_prior(x_m: jnp.ndarray, x_logs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Gaussian log-likelihood table for GlowTTS MAS, as 2 matmuls + 2 rank-1 terms.

    x_m, x_logs: [b, t_x, d] prior mean/log-std per token.
    z:           [b, t_y, d] flow latents per frame.
    returns logp [b, t_x, t_y] (reference glow_tts.py:90-95).
    """
    x_s_sq_r = jnp.exp(-2.0 * x_logs)  # [b, t_x, d]
    logp1 = jnp.sum(-0.5 * np.log(2.0 * np.pi) - x_logs, axis=-1, keepdims=True)  # [b, t_x, 1]
    logp2 = jnp.einsum("btd,byd->bty", x_s_sq_r, -0.5 * (z * z))
    logp3 = jnp.einsum("btd,byd->bty", x_m * x_s_sq_r, z)
    logp4 = jnp.sum(-0.5 * (x_m * x_m) * x_s_sq_r, axis=-1, keepdims=True)  # [b, t_x, 1]
    return logp1 + logp2 + logp3 + logp4
