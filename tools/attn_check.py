"""Hardware parity check for the fused small-T attention kernel.

Runs on the real TPU: forward + grads vs the unfused XLA path (fp32
HIGHEST-like comparison at f32, bf16 tolerance at bf16), dropout mean /
determinism-per-seed. Usage: python -m tools.attn_check
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from speech_masters_thesis_tpu.ops.pallas.attention import (
    SmallTAttnSpec, fused_attention)


def ref_attend(q, k, v, lengths, scale):
    T = q.shape[1]
    key_mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    causal = jnp.tril(jnp.ones((T, T)))
    bias = jnp.where((causal[None, None] * key_mask[:, None, None, :]) > 0, 0.0, -1e9)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST) * scale + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)


def main():
    assert jax.default_backend() == "tpu", "run on the TPU"
    B, T, H, D = 4, 257, 16, 32
    scale = 1.0 / math.sqrt(D)
    rng = np.random.RandomState(0)
    lengths = jnp.asarray([257, 200, 128, 31], jnp.int32)
    lens_f32 = jax.lax.bitcast_convert_type(lengths, jnp.float32)

    for dtype, tol_f, tol_g in ((jnp.float32, 5e-5, 5e-4), (jnp.bfloat16, 2e-2, 5e-2)):
        q = jnp.asarray(rng.randn(B, T, H, D), dtype)
        k = jnp.asarray(rng.randn(B, T, H, D), dtype)
        v = jnp.asarray(rng.randn(B, T, H, D), dtype)
        spec = SmallTAttnSpec(n_heads=H, d_head=D, scale=scale, p_drop=0.0)

        out = jax.jit(lambda q, k, v: fused_attention(spec, jnp.float32(0.0),
                                                      lens_f32, q, k, v))(q, k, v)
        ref = jax.jit(lambda q, k, v: ref_attend(q, k, v, lengths, scale))(q, k, v)
        mask = (jnp.arange(T)[None, :, None, None] < lengths[:, None, None, None])
        diff = jnp.abs(out.astype(jnp.float32) - ref) * mask
        print(f"{dtype.__name__}: fwd max err (valid rows) = {float(diff.max()):.3e}")
        assert float(diff.max()) < tol_f, "forward mismatch"

        def loss_fused(q, k, v):
            o = fused_attention(spec, jnp.float32(0.0), lens_f32, q, k, v)
            return (o.astype(jnp.float32) ** 2 * mask).sum()

        def loss_ref(q, k, v):
            return (ref_attend(q, k, v, lengths, scale) ** 2 * mask).sum()

        g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        for a, b, n in zip(g1, g2, "qkv"):
            rel = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
                        / (jnp.abs(b).max() + 1e-9))
            print(f"{dtype.__name__}: d{n} max rel err = {rel:.3e}")
            assert rel < tol_g, f"d{n} mismatch"

    # dropout: determinism per seed, mean preservation, fwd/bwd mask agreement
    spec_d = SmallTAttnSpec(n_heads=H, d_head=D, scale=scale, p_drop=0.1)
    q = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    seed = jax.lax.bitcast_convert_type(jnp.int32(1234), jnp.float32)
    f = jax.jit(lambda s: fused_attention(spec_d, s, lens_f32, q, k, v))
    o1, o2 = f(seed), f(seed)
    assert bool(jnp.array_equal(o1, o2)), "dropout not deterministic per seed"
    o3 = f(jax.lax.bitcast_convert_type(jnp.int32(99), jnp.float32))
    assert not bool(jnp.array_equal(o1, o3)), "seed has no effect"
    # E[dropout(P)] @ V ~ P @ V: compare mean over many seeds to p=0 output
    outs = [np.asarray(f(jax.lax.bitcast_convert_type(jnp.int32(s), jnp.float32)))
            for s in range(20)]
    mean = np.mean(outs, axis=0)
    base = np.asarray(jax.jit(lambda: fused_attention(
        SmallTAttnSpec(n_heads=H, d_head=D, scale=scale, p_drop=0.0),
        jnp.float32(0.0), lens_f32, q, k, v))())
    mrel = np.abs(mean - base).max() / (np.abs(base).max() + 1e-9)
    print(f"dropout 20-seed mean vs p=0: max rel {mrel:.3e} (expect ~1/sqrt(20)*p)")
    # gradient under dropout must be finite and nonzero
    gd = jax.jit(jax.grad(lambda q: (fused_attention(spec_d, seed, lens_f32,
                                                     q, k, v) ** 2).sum()))(q)
    assert bool(jnp.isfinite(gd).all()) and float(jnp.abs(gd).max()) > 0
    print("dropout determinism/mean/grad: OK")


if __name__ == "__main__":
    main()
