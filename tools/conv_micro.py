"""Microbenchmark: 1D conv lowering strategies on the TPU.

The train-step profile shows XLA's NWC conv1d running at ~22 TFLOP/s (11%
MXU) even for dense kernel-3 convs. Compares:
  * lax.conv_general_dilated (NWC)
  * shifted-matmul: y = sum_j shift(x, j) @ W[j]  (same math)
for the codec's hot shape. Usage: python -m tools.conv_micro
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from speech_masters_thesis_tpu.parallel.mesh import enable_compilation_cache
from speech_masters_thesis_tpu.utils import timing


def main():
    enable_compilation_cache()
    B, T, C = 16, 33024, 128
    K = 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, C, C).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    @jax.jit
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [(K // 2, K // 2)], dimension_numbers=("NWC", "WIO", "NWC"))

    @jax.jit
    def shifted(x, w):
        xp = jnp.pad(x, ((0, 0), (K // 2, K // 2), (0, 0)))
        y = jnp.dot(xp[:, 0:T], w[0])
        for j in range(1, K):
            y = y + jnp.dot(xp[:, j:j + T], w[j])
        return y

    flops = 2 * B * T * C * C * K
    for name, fn in (("conv_nwc", conv), ("shifted_matmul", shifted)):
        def run_one(carry, fn=fn):
            out = fn(carry, w)
            # probe must be a SCALAR: sync() device_gets it through the
            # tunnel, and pulling the full activation would swamp the timing
            return out.astype(jnp.bfloat16), jnp.sum(out.astype(jnp.float32))
        sec, _ = timing.time_steps(run_one, x, warmup=2, steps=10)
        print(f"{name}: {sec * 1e3:.2f} ms  {flops / sec / 1e12:.1f} TFLOP/s")
    # numerical agreement
    a, b = conv(x, w), shifted(x, w)
    print("max|diff| =", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
