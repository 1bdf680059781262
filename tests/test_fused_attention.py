"""Fused small-T attention kernel (ops/pallas/attention.py) vs the XLA path.

Runs in interpret mode on the CPU backend (conftest). Dropout uses the TPU
hardware PRNG which has no CPU lowering, so train-mode-with-dropout parity
is exercised on hardware (tools/attn_check.py); here the kernel runs with
p_drop=0, which covers masking (causal + per-batch key lengths), padding
(T not a multiple of 8), the recompute backward, the LM integration
routing, and shard_map data parallelism on the 8-device virtual mesh.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_masters_thesis_tpu.ops.pallas.attention import (
    SmallTAttnSpec, apply_fused_attention, fused_attention)


def _ref(q, k, v, lengths, scale):
    T = q.shape[1]
    key_mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    causal = jnp.tril(jnp.ones((T, T)))
    bias = jnp.where((causal[None, None] * key_mask[:, None, None, :]) > 0, 0.0, -1e9)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _mk(B=2, T=37, H=4, D=32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    lens = rng.randint(1, T + 1, (B,))
    lens[0] = T
    return q, k, v, jnp.asarray(lens, jnp.int32)


@pytest.mark.parametrize("T", [16, 37, 128, 257])
def test_fwd_and_grad_parity(T):
    q, k, v, lengths = _mk(T=T)
    D = q.shape[-1]
    spec = SmallTAttnSpec(n_heads=q.shape[2], d_head=D, scale=1.0 / math.sqrt(D),
                          p_drop=0.0, interpret=True)
    lens_f32 = jax.lax.bitcast_convert_type(lengths, jnp.float32)
    seed = jnp.float32(0.0)

    out = fused_attention(spec, seed, lens_f32, q, k, v)
    ref = _ref(q, k, v, lengths, spec.scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    g1 = jax.grad(lambda q, k, v: (fused_attention(spec, seed, lens_f32, q, k, v) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (_ref(q, k, v, lengths, spec.scale) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_lm_attention_routing_matches_unfused():
    """MultiHeadSelfAttention(fused=True) in eval == the unfused path
    (kernel runs in interpret mode on CPU; train+dropout falls back)."""
    from speech_masters_thesis_tpu.models.transformer_lm.model import (
        MultiHeadSelfAttention)
    from speech_masters_thesis_tpu.ops.basic import sequence_mask

    B, T, C, H = 2, 19, 64, 4
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lengths = jnp.asarray([19, 11], jnp.int32)
    key_mask = sequence_mask(lengths, T)
    causal = jnp.tril(jnp.ones((T, T)))
    bias = jnp.where((causal[None, None] * key_mask[:, None, None, :]) > 0, 0.0, -1e9)

    unfused = MultiHeadSelfAttention(C, H, dropout=0.1, fused=False)
    fused = MultiHeadSelfAttention(C, H, dropout=0.1, fused=True)
    variables = unfused.init({"params": jax.random.PRNGKey(0)}, x, bias,
                             train=False, key_mask=key_mask)
    y_ref = unfused.apply(variables, x, bias, train=False, key_mask=key_mask)
    y_fus = fused.apply(variables, x, bias, train=False, key_mask=key_mask)
    # compare only valid rows — masked rows differ by design (uniform probs
    # vs causal-prefix attention) and every consumer masks them
    m = np.asarray(key_mask)[..., None]
    np.testing.assert_allclose(np.asarray(y_ref) * m, np.asarray(y_fus) * m,
                               rtol=1e-5, atol=1e-5)


def test_shard_map_data_parallel():
    """apply_fused_attention under an active 8-device data mesh: sharded
    batch in, sharded batch out, same values as the single-device call."""
    from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh, shard_batch

    assert jax.device_count() == 8
    mesh = make_data_mesh()
    B, T, H, D = 8, 24, 2, 32
    q, k, v, lengths = _mk(B=B, T=T, H=H, D=D, seed=3)
    spec = SmallTAttnSpec(n_heads=H, d_head=D, scale=1.0 / math.sqrt(D),
                          p_drop=0.0, interpret=True)
    seed = jnp.float32(0.0)

    ref = fused_attention(spec, seed,
                          jax.lax.bitcast_convert_type(lengths, jnp.float32),
                          q, k, v)

    sharded = shard_batch(mesh, {"q": np.asarray(q), "k": np.asarray(k),
                                 "v": np.asarray(v),
                                 "lengths": np.asarray(lengths)})
    out = jax.jit(lambda qq, kk, vv, ll: apply_fused_attention(
        spec, seed, ll, qq, kk, vv))(sharded["q"], sharded["k"], sharded["v"],
                                     sharded["lengths"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
