"""Glow-TTS TextEncoder and FlowSpecDecoder (flax, NTC).

Rebuild of reference models/glow_tts/modules.py:9-236.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_masters_thesis_tpu.models.glow_tts.attention import (
    ChannelLayerNorm,
    ConvReluNorm,
    DurationPredictor,
    FeedForwardNetwork,
    RelativeSelfAttention,
)
from speech_masters_thesis_tpu.models.glow_tts.flows import ActNorm, CouplingBlock, InvConvNear
from speech_masters_thesis_tpu.ops.basic import sequence_mask


class _ConvParams(nn.Module):
    """Declares an nn.Conv's exact params (kernel/bias names, shapes, inits)
    without running it — the fused encoder-layer kernel consumes them
    directly (same trick as flows._WNParams / _EndConvParams)."""

    features: int
    kernel_size: int = 1
    kernel_init: object = None

    @nn.compact
    def __call__(self, in_features: int):
        init = self.kernel_init or nn.initializers.lecun_normal()
        kernel = self.param("kernel", init,
                            (self.kernel_size, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _ScaleBias(nn.Module):
    """LayerNorm param twin (named LayerNorm_0 under ChannelLayerNorm)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return scale, bias


class _LNParams(nn.Module):
    @nn.compact
    def __call__(self, features: int):
        return _ScaleBias(name="LayerNorm_0")(features)


class _AttnParams(nn.Module):
    """RelativeSelfAttention param twin (attention.py:60-156): conv_q/k/v
    xavier-init, shared-head relative tables, default-init conv_o."""

    channels: int
    n_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        C = self.channels
        D = C // self.n_heads
        xavier = nn.initializers.xavier_uniform()
        wq, bq = _ConvParams(C, kernel_init=xavier, name="conv_q")(C)
        wk, bk = _ConvParams(C, kernel_init=xavier, name="conv_k")(C)
        wv, bv = _ConvParams(C, kernel_init=xavier, name="conv_v")(C)
        rel_stddev = D ** -0.5
        rk = self.param("emb_rel_k", nn.initializers.normal(rel_stddev),
                        (1, 2 * self.window_size + 1, D))
        rv = self.param("emb_rel_v", nn.initializers.normal(rel_stddev),
                        (1, 2 * self.window_size + 1, D))
        wo, bo = _ConvParams(C, name="conv_o")(C)
        return (wq[0], bq, wk[0], bk, wv[0], bv, rk[0], rv[0], wo[0], bo)


class _FFNParams(nn.Module):
    """FeedForwardNetwork param twin (attention.py:187-208)."""

    out_channels: int
    filter_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        w1, b1 = _ConvParams(self.filter_channels, self.kernel_size,
                             name="conv_1")(in_features)
        w2, b2 = _ConvParams(self.out_channels, self.kernel_size,
                             name="conv_2")(self.filter_channels)
        return w1, b1, w2, b2


class TextEncoder(nn.Module):
    """Token ids -> prior statistics (mean, log-std) + log durations.

    Transformer-TTS-style stack of windowed relative attention + conv FFN
    with post-LN residuals; duration predictor runs on stop-gradient features
    (reference modules.py:95-131).
    """

    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    filter_channels_dp: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    window_size: int
    mean_only: bool = False
    prenet: bool = False
    gin_channels: int = 0
    # run each attention+FFN layer as one fused Pallas kernel
    # (ops/pallas/enc_layer.py); config knob: model.fused_encoder
    # (defaults to model.fused_blocks)
    fused: bool = False
    # largest text sequence the fused kernel handles per batch element
    # (whole-layer-in-VMEM design; beyond this, fall back to flax)
    fused_max_t: int = 512

    @nn.compact
    def __call__(self, text: jnp.ndarray, text_lengths: jnp.ndarray,
                 speaker_embeddings: Optional[jnp.ndarray] = None, train: bool = True):
        """text: [B, T] int -> (x_m, x_logs [B, T, out], logw [B, T], mask [B, T, 1])."""
        emb = nn.Embed(self.n_vocab, self.hidden_channels,
                       embedding_init=nn.initializers.normal(self.hidden_channels ** -0.5),
                       name="emb")
        x = emb(text) * math.sqrt(self.hidden_channels)  # [B, T, H]
        x_mask = sequence_mask(text_lengths, x.shape[1])[..., None].astype(x.dtype)  # [B, T, 1]

        if self.prenet:
            x = ConvReluNorm(self.hidden_channels, self.hidden_channels,
                             kernel_size=5, n_layers=3, p_dropout=0.1, name="pre")(
                x, x_mask, train=train)

        # fused whole-layer Pallas path (ops/pallas/enc_layer.py). The gate
        # conditions are exactly the configuration every shipped encoder
        # uses: windowed self-attention, shared-head tables, no block_length
        # / proximal bias / speaker conditioning in the attention itself.
        use_fused = (self.fused and self.window_size is not None
                     and x.shape[1] <= self.fused_max_t)
        if use_fused and train and self.p_dropout > 0 \
                and jax.default_backend() != "tpu":
            # in-kernel dropout needs the TPU hardware PRNG
            use_fused = False
        if use_fused:
            for i in range(self.n_layers):
                x = self._fused_layer(i, x, x_mask, train)
            x = x * x_mask
            return self._heads(x, x_mask, speaker_embeddings, train)

        attn_mask = x_mask[:, None, :, 0][..., None] * x_mask[:, None, None, :, 0]  # [B,1,T,T]
        for i in range(self.n_layers):
            x = x * x_mask
            y = RelativeSelfAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                window_size=self.window_size, p_dropout=self.p_dropout,
                name=f"attn_{i}")(x, x, attn_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + y)

            y = FeedForwardNetwork(self.hidden_channels, self.filter_channels,
                                   self.kernel_size, p_dropout=self.p_dropout,
                                   name=f"ffn_{i}")(x, x_mask, train=train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm2_{i}")(x + y)
        x = x * x_mask
        return self._heads(x, x_mask, speaker_embeddings, train)

    def _heads(self, x, x_mask, speaker_embeddings, train):
        """Prior-statistics and duration heads on the encoded features."""
        # duration predictor sees detached features (+ speaker cond)
        x_dp = jax.lax.stop_gradient(x)
        if speaker_embeddings is not None:
            g_exp = jnp.broadcast_to(speaker_embeddings[:, None, :],
                                     (x.shape[0], x.shape[1], speaker_embeddings.shape[-1]))
            x_dp = jnp.concatenate([x_dp, g_exp], axis=-1)

        x_m = nn.Conv(self.out_channels, (1,), name="proj_m")(x) * x_mask
        if not self.mean_only:
            x_logs = nn.Conv(self.out_channels, (1,), name="proj_s")(x) * x_mask
        else:
            x_logs = jnp.zeros_like(x_m)

        logw = DurationPredictor(self.filter_channels_dp, self.kernel_size,
                                 self.p_dropout, name="proj_w")(x_dp, x_mask, train=train)
        return x_m, x_logs, logw, x_mask

    def _fused_layer(self, i: int, x, x_mask, train):
        """One encoder layer (attn_{i} + norm1_{i} + ffn_{i} + norm2_{i}) as
        one Pallas kernel per batch element (ops/pallas/enc_layer.py).

        Identical param tree to the flax path (checkpoints interchangeable);
        identical math at valid positions; dropout uses the hardware PRNG
        (same Bernoulli law, different realization than threefry).
        """
        from speech_masters_thesis_tpu.ops.pallas.enc_layer import (
            EncLayerSpec, apply_fused_enc_layer)

        C = self.hidden_channels
        (wq, bq, wk, bk, wv, bv, rk, rv, wo, bo) = _AttnParams(
            C, self.n_heads, self.window_size, name=f"attn_{i}")()
        g1, be1 = _LNParams(name=f"norm1_{i}")(C)
        w1, b1, w2, b2 = _FFNParams(C, self.filter_channels,
                                    self.kernel_size, name=f"ffn_{i}")(C)
        g2, be2 = _LNParams(name=f"norm2_{i}")(C)

        p = self.p_dropout if train else 0.0
        if p > 0.0:
            seed_bits = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
            seed_f32 = jax.lax.bitcast_convert_type(seed_bits, jnp.float32)
        else:
            seed_f32 = jnp.float32(0.0)
        lens = jnp.sum(x_mask[..., 0], axis=1).astype(jnp.int32)

        spec = EncLayerSpec(
            channels=C, n_heads=self.n_heads, window=self.window_size,
            filter_channels=self.filter_channels, kernel_size=self.kernel_size,
            p_drop=float(p), interpret=jax.default_backend() != "tpu",
        )
        row = lambda v: v.reshape(1, -1)
        return apply_fused_enc_layer(
            spec, seed_f32, lens, x,
            wq, row(bq), wk, row(bk), wv, row(bv), rk, rv, wo, row(bo),
            row(g1), row(be1), w1, row(b1), w2, row(b2), row(g2), row(be2))


class FlowSpecDecoder(nn.Module):
    """Invertible mel <-> latent map: n_blocks x (ActNorm, InvConvNear, Coupling)
    over n_sqz-squeezed frames (reference modules.py:134-236)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_blocks: int
    n_layers: int
    p_dropout: float = 0.0
    n_split: int = 4
    n_sqz: int = 2
    sigmoid_scale: bool = False
    gin_channels: int = 0
    # fused Pallas conditioner kernels (ops/pallas/wn_coupling.py)
    fused: bool = False
    # when fused: fuse the WHOLE flow step (actnorm+invconv+conditioner) per
    # kernel; False keeps conditioner-only fusion (A/B knob: GLOW_FLOW_STEP)
    fused_flow_step: bool = True

    def setup(self):
        flows = []
        for b in range(self.n_blocks):
            flows.append(ActNorm(self.in_channels * self.n_sqz, name=f"actnorm_{b}"))
            flows.append(InvConvNear(self.in_channels * self.n_sqz, self.n_split,
                                     name=f"invconv_{b}"))
            flows.append(CouplingBlock(
                self.in_channels * self.n_sqz, self.hidden_channels,
                kernel_size=self.kernel_size, dilation_rate=self.dilation_rate,
                n_layers=self.n_layers, p_dropout=self.p_dropout,
                sigmoid_scale=self.sigmoid_scale, gin_channels=self.gin_channels,
                fused=self.fused, name=f"coupling_{b}"))
        self.flows = flows

    def __call__(self, spect: jnp.ndarray, spect_mask: jnp.ndarray,
                 speaker_embeddings: Optional[jnp.ndarray] = None,
                 reverse: bool = False, ddi: bool = False, train: bool = True):
        """spect: [B, T, C]; spect_mask: [B, T, 1]."""
        g = speaker_embeddings[:, None, :] if speaker_embeddings is not None else None
        x, x_mask = spect, spect_mask
        if self.n_sqz > 1:
            x, x_mask = squeeze(x, x_mask, self.n_sqz)

        logdet_tot = 0.0 if not reverse else None

        # One fused Pallas kernel per WHOLE flow step (actnorm -> invconv ->
        # coupling conditioner; ops/pallas/wn_coupling.py:fused_flow_step).
        # The per-layer logdets are computed here from params/lengths with
        # the exact expressions of the unfused layers.
        # max-T gate comes from the coupling block's own knob (one source of
        # truth with the conditioner-only fused path; advisor r3)
        fused_step = (self.fused and self.fused_flow_step
                      and not reverse and not ddi and g is None
                      and x.shape[1] <= self.flows[2].fused_max_t)
        if fused_step and train and self.p_dropout > 0 \
                and jax.default_backend() != "tpu":
            fused_step = False  # in-kernel dropout needs the TPU hardware PRNG
        if fused_step:
            c = self.in_channels * self.n_sqz
            x_len = jnp.sum(x_mask[:, :, 0], axis=1)            # [B]
            for bi in range(self.n_blocks):
                f_a, f_i, f_c = (self.flows[3 * bi], self.flows[3 * bi + 1],
                                 self.flows[3 * bi + 2])
                # prefix params stay f32: the kernel computes in f32 anyway
                # (it casts only dot operands), and f32 inputs keep the
                # custom_vjp param cotangents f32 like the unfused path
                mt = f_i.dense_matrix_t(jnp.float32)
                x, logdet_c = f_c(x, x_mask, train=train,
                                  prefix=(f_a.logs, f_a.bias, mt))
                # ActNorm logdet (flows.py:ActNorm) + InvConvNear logdet
                # (flows.py:InvConvNear; det > 0 by QR construction) — both
                # from the f32 params, exactly as the unfused layers compute
                _, slogdet = jnp.linalg.slogdet(f_i.weight.astype(jnp.float32))
                logdet_tot += (jnp.sum(f_a.logs) * x_len
                               + slogdet * (c / self.n_split) * x_len.astype(jnp.float32)
                               + logdet_c)
        else:
            flows = self.flows if not reverse else list(reversed(self.flows))
            for f in flows:
                if isinstance(f, CouplingBlock):
                    x, logdet = f(x, x_mask, g=g, reverse=reverse, ddi=ddi, train=train)
                else:
                    x, logdet = f(x, x_mask, g=g, reverse=reverse, ddi=ddi)
                if not reverse:
                    logdet_tot += logdet

        if self.n_sqz > 1:
            x, x_mask = unsqueeze(x, x_mask, self.n_sqz)
        return x, logdet_tot


def squeeze(x: jnp.ndarray, x_mask: Optional[jnp.ndarray] = None, n_sqz: int = 2):
    """Folds n_sqz consecutive frames into channels: [B,T,C] -> [B,T/n,n*C].

    Channel layout is n_sqz-major, matching reference modules.py:208-220.
    """
    b, t, c = x.shape
    t = (t // n_sqz) * n_sqz
    x = x[:, :t]
    x_sqz = x.reshape(b, t // n_sqz, n_sqz * c)
    if x_mask is not None:
        x_mask = x_mask[:, n_sqz - 1::n_sqz]
    else:
        x_mask = jnp.ones((b, t // n_sqz, 1), x.dtype)
    return x_sqz * x_mask, x_mask


def unsqueeze(x: jnp.ndarray, x_mask: Optional[jnp.ndarray] = None, n_sqz: int = 2):
    """[B,T,n*C] -> [B,T*n,C] (inverse of squeeze)."""
    b, t, c = x.shape
    x_unsqz = x.reshape(b, t * n_sqz, c // n_sqz)
    if x_mask is not None:
        x_mask = jnp.repeat(x_mask, n_sqz, axis=1)
    else:
        x_mask = jnp.ones((b, t * n_sqz, 1), x.dtype)
    return x_unsqz * x_mask, x_mask
