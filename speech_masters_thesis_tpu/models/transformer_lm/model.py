"""Causal Transformer LM over VQ codes (flax, NTC).

Rebuild of reference models/transformer_lm/transformer_lm.py:14-155.
Matches torch ``nn.TransformerEncoderLayer`` semantics exactly (post-LN,
ReLU FF, dropout on attention probabilities, final encoder LayerNorm) so
that transplanted weights produce identical logits — verified by the
weight-transplant parity test in tests/test_transformer_lm.py.

Differences by design (TPU-first):
  * masks use -1e9 additive logits instead of -inf so fully-padded rows
    produce a uniform (grad-safe) distribution instead of NaNs;
  * ``sample`` is a KV-cached ``lax.scan`` decode loop — the reference
    re-forwards the whole prefix every step with no cache
    (transformer_lm.py:143-151), which is O(T^2 * L) per token.

The frozen VQ-VAE decoder used for audio reconstruction is held as
bottleneck+decoder submodules under the ``vqvae`` scope (mirroring the
reference's ModuleDict, transformer_lm.py:94-99); its weights are grafted
from a VQ-VAE checkpoint and masked out of the optimizer.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_masters_thesis_tpu.models.base import TokenToWaveformModel
from speech_masters_thesis_tpu.models.vqvae.bottleneck import BottleneckBlock
from speech_masters_thesis_tpu.models.vqvae.encdec import Decoder
from speech_masters_thesis_tpu.ops.basic import sequence_mask, softmax_f32
from speech_masters_thesis_tpu.ops.losses import focal_loss, masked_cross_entropy, mmi_loss
from speech_masters_thesis_tpu.utils.config import Config

PAD = 0
BOS = 1
OFFSET = 2
NEG_INF = -1e9


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(np.arange(0, d_model, 2).astype(np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class MultiHeadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention-parity self-attention (packed qkv proj).

    ``fused=True`` routes the causal softmax-attention through the stock
    Pallas TPU flash-attention kernel instead of materializing the
    [B, H, T, T] logits in HBM (which the trace showed at ~41% of the LM
    train step). Documented deviation: the fused path does NOT apply
    dropout to the attention probabilities (flash kernels keep the
    probability matrix implicit); all other dropouts are unchanged.
    """

    d_model: int
    n_heads: int
    dropout: float = 0.0
    fused: bool = False

    def setup(self):
        # packed in_proj like torch: one (d, 3d) kernel
        self.in_proj = nn.Dense(3 * self.d_model, name="in_proj")
        self.out_proj = nn.Dense(self.d_model, name="out_proj")
        self.attn_dropout = nn.Dropout(self.dropout)

    def _split_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_heads, self.d_model // self.n_heads)

    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray, train: bool = True,
                 key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: [B, T, C]; attn_bias: broadcastable to [B, H, T, T] additive
        logits (causal + key-padding). key_mask: [B, T] 1=valid — only
        needed by the fused path, which reconstructs the same masking from
        causal=True + segment ids."""
        qkv = self.in_proj(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = self._split_heads(q)
        k = self._split_heads(k)
        v = self._split_heads(v)
        t = q.shape[1]
        if self.fused and key_mask is not None:
            on_tpu = jax.default_backend() == "tpu"
            dropping = train and self.dropout > 0
            if t <= 1024 and (on_tpu or not dropping):
                # small-T fused kernel: whole [T,T] head in VMEM, in-kernel
                # dropout (TPU hardware PRNG — no interpret lowering, so the
                # CPU/interpret path falls back when dropout is active)
                return self._attend_smallt(q, k, v, key_mask, train)
            if on_tpu and not dropping:
                # long-T: stock flash (O(T) memory); keeps the probability
                # matrix implicit so attention-prob dropout cannot apply
                return self._attend_flash(q, k, v, key_mask)
        return self._attend(q, k, v, attn_bias, train)

    def _attend(self, q, k, v, attn_bias, train):
        d_head = self.d_model // self.n_heads
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_head)
        # bias follows the activation dtype: an f32 bias would promote the
        # whole [B,H,T,T] chain (logits, probs, dropout mask, their backward
        # echoes) to f32 — measured 35% of the bf16 train step in HBM copies
        # of f32[8,16,257,257] tensors. Softmax still reduces in f32.
        logits = logits + attn_bias.astype(logits.dtype)
        # f32-internal softmax with dtype-of-x residuals (ops/basic.py)
        probs = softmax_f32(logits)
        probs = self.attn_dropout(probs, deterministic=not train)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        b, t = out.shape[0], out.shape[1]
        return self.out_proj(out.reshape(b, t, self.d_model))

    def _attend_smallt(self, q, k, v, key_mask, train):
        """Fused VMEM-resident attention (ops/pallas/attention.py).

        Equivalent to `_attend` at valid positions; dropout uses the TPU
        hardware PRNG (documented deviation, same as the other fused
        kernels). q/k/v stay in [B, T, H, D] — no [B,H,T,D] transpose.
        """
        from speech_masters_thesis_tpu.ops.pallas.attention import (
            SmallTAttnSpec, apply_fused_attention)

        b, t, h, d = q.shape
        p = float(self.dropout) if train else 0.0
        if p > 0.0:
            seed_bits = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
            seed_f32 = jax.lax.bitcast_convert_type(seed_bits, jnp.float32)
        else:
            seed_f32 = jnp.float32(0.0)
        spec = SmallTAttnSpec(n_heads=h, d_head=d, scale=1.0 / math.sqrt(d),
                              p_drop=p,
                              interpret=jax.default_backend() != "tpu")
        lengths = jnp.sum(key_mask.astype(jnp.int32), axis=-1)
        out = apply_fused_attention(spec, seed_f32, lengths, q, k, v)
        return self.out_proj(out.reshape(b, t, self.d_model))

    def _attend_flash(self, q, k, v, key_mask):
        """Pallas flash attention: causal + segment-id padding mask.

        Equivalent to `_attend` at valid positions: invalid keys never
        contribute to valid queries (different segment), and invalid query
        rows produce harmless garbage that the loss mask / downstream
        masking discards (exactly like the -1e9-everywhere rows of the
        unfused path).
        """
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)

        b, t, h, d = q.shape
        tp = -(-t // 128) * 128
        pad = ((0, 0), (0, tp - t), (0, 0), (0, 0))
        # [B, T, H, D] -> [B, H, Tp, D]
        qt = jnp.pad(q, pad).transpose(0, 2, 1, 3)
        kt = jnp.pad(k, pad).transpose(0, 2, 1, 3)
        vt = jnp.pad(v, pad).transpose(0, 2, 1, 3)
        seg = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, tp - t)))
        out = flash_attention(qt, kt, vt, segment_ids=SegmentIds(seg, seg),
                              causal=True, sm_scale=1.0 / math.sqrt(d))
        out = out.transpose(0, 2, 1, 3)[:, :t]
        return self.out_proj(out.reshape(b, t, self.d_model))

    def decode_step(self, x_t: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                    position: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Single-token attention against a KV cache.

        x_t: [B, 1, C]; k_cache/v_cache: [B, T_max, H, D]; position: scalar.
        Returns (y [B,1,C], new_k_cache, new_v_cache).
        """
        qkv = self.in_proj(x_t)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = self._split_heads(q)  # [B, 1, H, D]
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, self._split_heads(k), position, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, self._split_heads(v), position, axis=1)
        d_head = self.d_model // self.n_heads
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache) / math.sqrt(d_head)
        t_max = k_cache.shape[1]
        valid = (jnp.arange(t_max) <= position)[None, None, None, :]
        logits = jnp.where(valid, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v_cache)
        b = out.shape[0]
        return self.out_proj(out.reshape(b, 1, self.d_model)), k_cache, v_cache


class TransformerEncoderLayer(nn.Module):
    """torch-parity post-LN encoder layer: attn -> add&norm -> FF -> add&norm."""

    d_model: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    layer_norm_eps: float = 1e-5
    fused_attention: bool = False

    def setup(self):
        self.self_attn = MultiHeadSelfAttention(self.d_model, self.n_heads, self.dropout,
                                                fused=self.fused_attention)
        self.linear1 = nn.Dense(self.dim_feedforward)
        self.linear2 = nn.Dense(self.d_model)
        self.norm1 = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.norm2 = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.drop_ff = nn.Dropout(self.dropout)
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)

    def _ff(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = nn.relu(self.linear1(x))
        h = self.drop_ff(h, deterministic=not train)
        return self.linear2(h)

    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray, train: bool = True,
                 key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        h = self.self_attn(x, attn_bias, train=train, key_mask=key_mask)
        x = self.norm1(x + self.drop1(h, deterministic=not train))
        h = self._ff(x, train)
        x = self.norm2(x + self.drop2(h, deterministic=not train))
        return x

    def decode_step(self, x_t, k_cache, v_cache, position):
        h, k_cache, v_cache = self.self_attn.decode_step(x_t, k_cache, v_cache, position)
        x_t = self.norm1(x_t + h)
        x_t = self.norm2(x_t + self._ff(x_t, train=False))
        return x_t, k_cache, v_cache


class TransformerLM(TokenToWaveformModel):

    PAD = PAD
    BOS = BOS
    OFFSET = OFFSET

    config: dict

    def setup(self):
        full_cfg = Config(self.config)
        cfg = full_cfg.model
        self.d_model = cfg.d_model
        self.vocab_size = cfg.vocab_size
        self.num_layers = cfg.num_layers
        self.loss_type = cfg.loss_type

        # padding_idx=0 semantics: pad row zero-initialized; loss masking keeps
        # it gradient-free (reference transformer_lm.py:43-47)
        def emb_init(key, shape, dtype=jnp.float32):
            table = jax.random.normal(key, shape, dtype)
            return table.at[PAD].set(0.0)

        self.embedding = nn.Embed(cfg.vocab_size + OFFSET, cfg.embed_dim,
                                  embedding_init=emb_init)
        self.pe = jnp.asarray(sinusoidal_table(cfg.max_len, cfg.d_model))
        self.pos_dropout = nn.Dropout(cfg.dropout)
        self.layers = [
            TransformerEncoderLayer(cfg.d_model, cfg.nhead, cfg.dim_feedforward,
                                    cfg.dropout, cfg.layer_norm_eps,
                                    fused_attention=cfg.get("fused_attention", False),
                                    name=f"layer_{i}")
            for i in range(cfg.num_layers)
        ]
        self.final_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_norm")
        self.classifier = nn.Dense(cfg.vocab_size)

        # Frozen VQ-VAE bottleneck + decoder for reconstruction, built from the
        # VQ-VAE's own config (reference load_vqvae, transformer_lm.py:85-99).
        vq_cfg = Config(full_cfg.vqvae_model_config).model if "vqvae_model_config" in full_cfg \
            else None
        if vq_cfg is not None:
            multiplier = (vq_cfg.multipliers or [1] * vq_cfg.levels)[-1]
            self.vq_bottleneck = BottleneckBlock(
                vq_cfg.l_bins, vq_cfg.emb_width, vq_cfg.mu, vq_cfg.revival_threshold,
                name="vqvae_bottleneck")
            self.vq_decoder = Decoder(
                input_emb_width=1,
                output_emb_width=vq_cfg.emb_width,
                levels=vq_cfg.levels,
                downs_t=tuple(vq_cfg.downs_t),
                strides_t=tuple(vq_cfg.strides_t),
                width=vq_cfg.width * multiplier,
                depth=vq_cfg.depth * multiplier,
                m_conv=vq_cfg.m_conv,
                block_type=vq_cfg.block_type,
                dilation_growth_rate=vq_cfg.dilation_growth_rate,
                dilation_cycle=vq_cfg.dilation_cycle,
                kernel_size_growth_rate=vq_cfg.kernel_size_growth_rate,
                kernel_size_cycle=vq_cfg.kernel_size_cycle,
                zero_out=vq_cfg.zero_out,
                reverse_decoder_dilation=vq_cfg.reverse_decoder_dilation,
                fused=vq_cfg.get("fused_blocks", False),
                name="vqvae_decoder")
        else:
            self.vq_bottleneck = None
            self.vq_decoder = None

    # parameter subtrees excluded from optimizer updates
    FROZEN_PREFIXES = ("vqvae_bottleneck", "vqvae_decoder")

    @staticmethod
    def dummy_batch(config) -> dict:
        t = 16
        return {
            "token": jnp.zeros((1, t), jnp.int32),
            "token_len": jnp.full((1,), t, jnp.int32),
            "audio": None,
            "audio_len": None,
            "speaker": None,
        }

    def _backbone(self, tokens: jnp.ndarray, attn_bias: jnp.ndarray, train: bool,
                  key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        x = self.embedding(tokens) * math.sqrt(self.d_model)
        # pe is an f32 constant: adding it un-cast would promote x — and with
        # it the ENTIRE backbone incl. every [B,H,T,T] attention tensor — to
        # f32, silently defeating bf16 mixed precision (measured: the "bf16"
        # step ran f32 throughout; 4x MXU cost + 2x HBM on the logits chain)
        x = x + self.pe[None, :x.shape[1]].astype(x.dtype)
        x = self.pos_dropout(x, deterministic=not train)
        for layer in self.layers:
            x = layer(x, attn_bias, train=train, key_mask=key_mask)
        return self.final_norm(x)

    def reconstruct(self, codes: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """VQ codes [B, T] -> waveform [B, T * compression] via frozen VQ-VAE."""
        y = self.vq_bottleneck.decode(codes)  # [B, T, C]
        y, out_mask = self.vq_decoder([y], [mask[..., None].astype(y.dtype)],
                                      all_levels=False, train=False)
        return (y * out_mask)[..., 0]

    def __call__(self, x: jnp.ndarray, x_lengths: jnp.ndarray,
                 y: Optional[jnp.ndarray] = None, y_lengths: Optional[jnp.ndarray] = None,
                 speaker=None, train: bool = True):
        """x: [B, T] shifted VQ codes (PAD=0, BOS=1, +OFFSET)."""
        b, t = x.shape
        key_mask = sequence_mask(x_lengths, t)  # [B, T] 1=valid
        causal = jnp.tril(jnp.ones((t, t), jnp.float32))
        bias = jnp.where((causal[None, None] * key_mask[:, None, None, :]) > 0, 0.0, NEG_INF)

        h = self._backbone(x, bias, train, key_mask=key_mask)
        logits = self.classifier(h)  # [B, T, vocab]

        targets = x[:, 1:].reshape(-1)
        logits_flat = logits[:, :-1].reshape(targets.shape[0], -1)
        loss_mask = (targets >= OFFSET).astype(jnp.float32)
        shifted = jnp.maximum(targets - OFFSET, 0)

        if self.loss_type == "ce":
            loss = masked_cross_entropy(logits_flat, shifted, loss_mask)
        elif self.loss_type == "mmi":
            loss = mmi_loss(logits_flat, shifted, self.vocab_size, mask=loss_mask)
        elif self.loss_type == "focal":
            loss = focal_loss(logits_flat, shifted, gamma=10.0, mask=loss_mask)
        else:
            raise ValueError(f"Loss function {self.loss_type} not supported")

        correct = (shifted == jnp.argmax(logits_flat, axis=-1)).astype(jnp.float32)
        accuracy = jnp.sum(correct * loss_mask) / jnp.maximum(jnp.sum(loss_mask), 1.0)

        yh = None
        if not train and self.vq_bottleneck is not None:
            pred_codes = jnp.argmax(logits[:, :-1], axis=-1)
            yh = self.reconstruct(pred_codes, key_mask[:, :-1])

        return {"loss": loss, "yh": yh}, {"accuracy": accuracy}

    # -- autoregressive sampling (KV-cached scan) --------------------------------
    def sample(self, batch_size: int, n_steps: int, rng: jax.Array, sigma: float = 1.0):
        """Draws codes [B, n_steps] ~ LM, then reconstructs audio.

        One compiled lax.scan; per-step cost is O(T * L) attention against the
        KV cache instead of the reference's full prefix re-forward.

        NOTE (deliberate deviation): the reference feeds sampled *raw* code
        ids back into the embedding without re-adding OFFSET
        (transformer_lm.py:150-151), inconsistent with how training inputs
        are offset (vqlatent.py:87-88). Here feedback tokens get +OFFSET so
        the sampling distribution matches what the model was trained on;
        reconstruction consumes raw ids in both frameworks.
        """
        cfg = Config(self.config).model
        d_head = cfg.d_model // cfg.nhead
        t_max = n_steps + 1

        k_caches = jnp.zeros((cfg.num_layers, batch_size, t_max, cfg.nhead, d_head))
        v_caches = jnp.zeros_like(k_caches)
        bos = jnp.full((batch_size, 1), BOS, jnp.int32)

        def step(carry, step_rng):
            tokens, k_caches, v_caches, position = carry
            x = self.embedding(tokens) * math.sqrt(self.d_model)
            x = x + jax.lax.dynamic_slice_in_dim(self.pe, position, 1,
                                                 axis=0)[None].astype(x.dtype)
            new_k, new_v = [], []
            for i, layer in enumerate(self.layers):
                x, k_c, v_c = layer.decode_step(x, k_caches[i], v_caches[i], position)
                new_k.append(k_c)
                new_v.append(v_c)
            x = self.final_norm(x)
            logits = self.classifier(x[:, 0])  # [B, vocab]
            nxt = jax.random.categorical(step_rng, logits / sigma, axis=-1)  # [B]
            nxt_tokens = (nxt + OFFSET).astype(jnp.int32)[:, None]
            carry = (nxt_tokens, jnp.stack(new_k), jnp.stack(new_v), position + 1)
            return carry, nxt.astype(jnp.int32)

        keys = jax.random.split(rng, n_steps)
        (_, _, _, _), codes = jax.lax.scan(step, (bos, k_caches, v_caches, 0), keys)
        codes = jnp.moveaxis(codes, 0, 1)  # [B, n_steps], un-offset vocab ids

        audio = None
        if self.vq_bottleneck is not None:
            audio = self.reconstruct(codes, jnp.ones(codes.shape, jnp.float32))
        return audio, codes


def load_vqvae_into_variables(variables: dict, vq_log_dir: str, ckpt_num) -> dict:
    """Grafts a trained VQ-VAE checkpoint into an initialized LM variable tree.

    Mirrors reference TransformerLM.load_vqvae (transformer_lm.py:85-99):
    the decoder params and the codebook of the pointed-at checkpoint replace
    the LM's freshly initialized ``vqvae_decoder`` / ``vqvae_bottleneck``
    entries.
    """
    import orbax.checkpoint as ocp
    from speech_masters_thesis_tpu.train.checkpoint import ckpt_dir

    payload = ocp.PyTreeCheckpointer().restore(ckpt_dir(vq_log_dir, ckpt_num))
    vq_state = payload["state"]
    params = dict(variables["params"])
    params["vqvae_decoder"] = vq_state["params"]["decoder"]
    variables = dict(variables)
    variables["params"] = params
    codebook = dict(variables.get("codebook", {}))
    codebook["vqvae_bottleneck"] = vq_state["model_state"]["codebook"]["bottleneck"]["level_0"]
    variables["codebook"] = codebook
    return variables
