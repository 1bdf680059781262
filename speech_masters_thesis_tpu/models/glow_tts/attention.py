"""Glow-TTS text-encoder submodules: windowed relative attention, conv FFN,
prenet, duration predictor (flax, NTC).

Rebuild of reference models/glow_tts/submodules.py:98-637. The relative-
position attention uses the same pad/reshape relative->absolute indexing
trick (submodules.py:525-554), which lowers to pure reshapes + one extra
matmul — MXU-friendly, no gathers.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_masters_thesis_tpu.ops.basic import softmax_f32

NEG_MASK = -1e4  # reference uses masked_fill(-1e4) (submodules.py:478)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels with eps=1e-4 (reference submodules.py:98-117)."""

    channels: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.eps)(x)


class ConvReluNorm(nn.Module):
    """Prenet: n x (conv -> LN -> relu -> dropout), zero-init residual proj."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        assert self.n_layers > 1, "Number of layers should be larger than 0."
        pad = self.kernel_size // 2
        x_org = x
        for i in range(self.n_layers):
            x = nn.Conv(self.hidden_channels, (self.kernel_size,), padding=[(pad, pad)],
                        name=f"conv_{i}")(x * mask)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = x_org + nn.Conv(self.out_channels, (1,), kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros, name="proj")(x)
        return x * mask


class RelativeSelfAttention(nn.Module):
    """Multi-head self-attention with windowed relative position embeddings.

    Reference AttentionBlock (submodules.py:403-565). ``window_size`` bounds
    relative offsets to [-w, w]; shared-head relative embeddings by default.
    """

    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = None
    heads_share: bool = True
    p_dropout: float = 0.0
    block_length: Optional[int] = None
    proximal_bias: bool = False
    proximal_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray,
                 attn_mask: Optional[jnp.ndarray] = None, train: bool = True) -> jnp.ndarray:
        """x (queries), c (keys/values): [B, T, C]; attn_mask: [B, 1, T, T]."""
        k_channels = self.channels // self.n_heads
        xavier = nn.initializers.xavier_uniform()
        if self.proximal_init:
            # reference submodules.py:444-447: conv_k starts as a copy of
            # conv_q (weights AND bias). compact order guarantees conv_q
            # initializes first; its initializers cache the drawn values and
            # conv_k's initializers return the cached copies (init-time only
            # — the params are independent leaves and diverge in training).
            cache = {}

            def q_kernel_init(rng, shape, dtype=jnp.float32):
                cache["kernel"] = xavier(rng, shape, dtype)
                return cache["kernel"]

            def q_bias_init(rng, shape, dtype=jnp.float32):
                cache["bias"] = nn.initializers.zeros(rng, shape, dtype)
                return cache["bias"]

            q = nn.Conv(self.channels, (1,), kernel_init=q_kernel_init,
                        bias_init=q_bias_init, name="conv_q")(x)
            k = nn.Conv(self.channels, (1,),
                        kernel_init=lambda rng, shape, dtype=jnp.float32: cache["kernel"],
                        bias_init=lambda rng, shape, dtype=jnp.float32: cache["bias"],
                        name="conv_k")(c)
        else:
            q = nn.Conv(self.channels, (1,), kernel_init=xavier, name="conv_q")(x)
            k = nn.Conv(self.channels, (1,), kernel_init=xavier, name="conv_k")(c)
        v = nn.Conv(self.channels, (1,), kernel_init=xavier, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        qh = q.reshape(b, t_t, self.n_heads, k_channels).transpose(0, 2, 1, 3)  # [B,H,T,D]
        kh = k.reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(k_channels)

        if self.window_size is not None:
            assert t_s == t_t, "Relative attention is only available for self-attention."
            n_heads_rel = 1 if self.heads_share else self.n_heads
            rel_stddev = k_channels ** -0.5
            emb_rel_k = self.param(
                "emb_rel_k", nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, k_channels))
            emb_rel_v = self.param(
                "emb_rel_v", nn.initializers.normal(rel_stddev),
                (n_heads_rel, 2 * self.window_size + 1, k_channels))
            key_rel = _get_relative_embeddings(emb_rel_k, t_s, self.window_size)
            rel_logits = jnp.einsum("bhqd,hmd->bhqm", qh, key_rel)
            scores = scores + _relative_to_absolute(rel_logits) / math.sqrt(k_channels)

        if self.proximal_bias:
            assert t_s == t_t, "Proximal bias is only available for self-attention."
            r = jnp.arange(t_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None]

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, NEG_MASK, scores)
            if self.block_length is not None:
                band = jnp.tril(jnp.triu(jnp.ones((t_t, t_s)), -self.block_length), self.block_length)
                scores = scores * band[None, None] + NEG_MASK * (1.0 - band[None, None])

        # f32-internal softmax, residuals in the activation dtype (bf16 under
        # mixed precision) — see ops/basic.py:softmax_f32
        p_attn = softmax_f32(scores)
        p_attn = nn.Dropout(self.p_dropout, deterministic=not train)(p_attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", p_attn, vh)

        if self.window_size is not None:
            rel_weights = _absolute_to_relative(p_attn)
            value_rel = _get_relative_embeddings(emb_rel_v, t_s, self.window_size)
            out = out + jnp.einsum("bhqm,hmd->bhqd", rel_weights, value_rel)

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return nn.Conv(self.out_channels, (1,), name="conv_o")(out)


def _get_relative_embeddings(emb: jnp.ndarray, length: int, window_size: int) -> jnp.ndarray:
    """Pads/slices the (h, 2w+1, d) table to (h, 2*length-1, d)."""
    pad_length = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start:start + 2 * length - 1]


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, l, 2l-1] -> [b, h, l, l] via the pad-and-reshape skew trick."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, length * 2 * length)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, length - 1)))
    x_final = x_flat.reshape(b, h, length + 1, 2 * length - 1)
    return x_final[:, :, :length, length - 1:]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, l, l] -> [b, h, l, 2l-1] (inverse skew)."""
    b, h, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, length - 1)))
    x_flat = x.reshape(b, h, length * length + length * (length - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (length, 0)))
    return x_flat.reshape(b, h, length, 2 * length)[:, :, :, 1:]


class FeedForwardNetwork(nn.Module):
    """Conv FFN with optional quick-GELU (reference submodules.py:568-599)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        pad = self.kernel_size // 2
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding=[(pad, pad)],
                    name="conv_1")(x * mask)
        if self.activation == "gelu":
            x = x * nn.sigmoid(1.702 * x)
        else:
            x = nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=not train)(x)
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding=[(pad, pad)],
                    name="conv_2")(x * mask)
        return x * mask


class DurationPredictor(nn.Module):
    """FastSpeech-style per-token log-duration head (submodules.py:602-637)."""

    filter_channels: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: [B, T, C]; mask: [B, T, 1] -> log-durations [B, T]."""
        pad = self.kernel_size // 2
        h = nn.Conv(self.filter_channels, (self.kernel_size,), padding=[(pad, pad)],
                    name="conv_1")(x * mask)
        h = nn.relu(h)
        h = ChannelLayerNorm(self.filter_channels, name="norm_1")(h)
        h = nn.Dropout(self.p_dropout, deterministic=not train)(h)
        h = nn.Conv(self.filter_channels, (self.kernel_size,), padding=[(pad, pad)],
                    name="conv_2")(h * mask)
        h = nn.relu(h)
        h = ChannelLayerNorm(self.filter_channels, name="norm_2")(h)
        h = nn.Dropout(self.p_dropout, deterministic=not train)(h)
        h = nn.Conv(1, (1,), name="proj")(h * mask)
        return (h * mask)[..., 0]
