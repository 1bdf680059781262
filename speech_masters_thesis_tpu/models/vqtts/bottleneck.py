"""Grouped (per-phoneme) VQ bottleneck for VQ-TTS (flax, functional state).

Rebuild of reference models/vqtts/bottleneck.py:7-77: the codebook holds
``n_vocab * l_bins`` centroids laid out as ``l_bins`` codes per phoneme.
Each audio frame is aligned to a phoneme id via the MAS attention matrix
and quantized against only that phoneme's group — a [N, l_bins] distance
table gathered from the big codebook, with relative->absolute index
conversion for the EMA update.

Inherits all EMA/revival machinery from the base BottleneckBlock.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from speech_masters_thesis_tpu.models.vqvae.bottleneck import HIGHEST, BottleneckBlock


class GroupedBottleneck(BottleneckBlock):
    """k_bins = n_vocab * l_bins; quantization restricted per aligned phoneme."""

    n_vocab: int = 1
    l_bins: int = 1

    def __call__(self, y_enc: jnp.ndarray, x_id: jnp.ndarray, attn: jnp.ndarray,
                 update_k: bool = True):
        """y_enc: [B, T_y, C] audio encodings; x_id: [B, T_x] token ids;
        attn: [B, T_x, T_y] hard alignment. Returns (q_rel [B,T_y], y_d,
        commit_loss, metrics)."""
        b, t_y, c = y_enc.shape

        # frames covered by the alignment (attn column sums) are valid
        mask = jnp.sum(attn, axis=1)  # [B, T_y]
        m_flat = mask.reshape(b * t_y).astype(jnp.float32)

        # align token ids to frames: frame j gets the id of its phoneme
        x_id_frames = jnp.einsum("btY,bt->bY", attn, x_id.astype(attn.dtype))
        x_id_flat = x_id_frames.reshape(b * t_y).astype(jnp.int32)

        y_flat = y_enc.reshape(b * t_y, c)

        if update_k:
            rng = self.make_rng("codebook")
            self._maybe_init(y_flat, m_flat, rng)

        # per-frame group of l_bins candidate centroids
        k_groups = self.k.value.reshape(self.n_vocab, self.l_bins, c)
        k_frame = jnp.take(k_groups, x_id_flat, axis=0)  # [N, l_bins, C]

        y32 = y_flat.astype(jnp.float32)
        k32 = k_frame.astype(jnp.float32)
        cross = jnp.einsum("nc,nlc->nl", y32, k32, precision=HIGHEST)
        distance = (jnp.sum(y32 * y32, axis=-1, keepdims=True)
                    - 2.0 * cross + jnp.sum(k32 * k32, axis=-1))  # [N, l_bins]
        q_rel = jnp.argmin(distance, axis=-1)
        min_distance = jnp.min(distance, axis=-1)

        # relative group index -> absolute codebook index
        q_abs = x_id_flat * self.l_bins + q_rel.astype(jnp.int32)
        y_d = jnp.take(self.k.value, q_abs, axis=0)  # [N, C]

        metrics = {}
        if update_k:
            metrics = self._update_k(y_flat, m_flat, q_abs, rng)

        # Reference metric quirk (vqtts/bottleneck.py:54, same (N,)x(N,1)
        # broadcast as the base class): fit reduces to sum(min_distance)/l_bins.
        fit = jnp.sum(min_distance) / distance.shape[-1]
        metrics = dict(fit=fit, **metrics)

        diff = (jax.lax.stop_gradient(y_d) - y_flat.astype(jnp.float32)) * m_flat[:, None]
        commit_loss = jnp.sum(diff * diff) / (jnp.maximum(jnp.sum(m_flat), 1.0) * c)

        y_d = y_d.astype(y_flat.dtype)
        y_d = y_flat + jax.lax.stop_gradient(y_d - y_flat)
        y_d = (y_d * m_flat.astype(y_d.dtype)[:, None]).reshape(b, t_y, c)
        return q_rel.reshape(b, t_y), y_d, commit_loss, metrics
