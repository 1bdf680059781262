"""EMA k-means vector-quantization bottleneck (flax, functional state).

TPU-native rebuild of reference models/vqvae/bottleneck.py:10-269. The
reference mutates registered torch buffers in-place and synchronizes them
with explicit NCCL broadcast/all_reduce calls (bottleneck.py:41-43,72-75).
Here the codebook lives in a flax ``codebook`` variable collection and is
updated *functionally inside the jitted train step*:

  * statistics (k_sum, k_elem) are computed by one [K, NT] x [NT, C] matmul
    over the *global* batch — under pjit with a batch-sharded input XLA
    inserts the cross-replica reduction automatically, replacing the
    reference's ``all_reduce(SUM)``;
  * revival/init randomness comes from a PRNG key that is replicated across
    the mesh, so every replica computes identical restart vectors and the
    reference's rank-0 ``broadcast`` disappears;
  * lazy data-dependent init (reference init_k on first batch) becomes a
    ``lax.cond`` on the ``initialized`` flag — no host round trip.

Quantization distances run at fp32 HIGHEST precision: code indices are a
serialization format (BASELINE north star: bitwise match), so argmin inputs
must not be computed in bf16.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_masters_thesis_tpu.ops.basic import safe_log, safe_sqrt

HIGHEST = jax.lax.Precision.HIGHEST


def _sample_rows(rng: jax.Array, x: jnp.ndarray, weights: jnp.ndarray, k: int) -> jnp.ndarray:
    """Draws k rows of x (weighted by ``weights``) and perturbs with tiny noise.

    Functional stand-in for the reference's tile+randperm sampling
    (bottleneck.py:26-33,39-40): random valid rows used for codebook init and
    dead-code revival. Sampling is with replacement (static shapes under
    jit); the same 0.01/sqrt(C) noise the reference applies when tiling is
    always added so duplicate draws stay distinguishable.
    """
    n, c = x.shape
    rng_idx, rng_noise = jax.random.split(rng)
    logits = safe_log(weights, eps=1e-30)
    idx = jax.random.categorical(rng_idx, logits, shape=(k,))
    rows = x[idx]
    noise = jax.random.normal(rng_noise, (k, c), dtype=x.dtype) * (0.01 / np.sqrt(c))
    return rows + noise


class BottleneckBlock(nn.Module):
    """Single-level EMA k-means codebook over [B, T, C] encodings."""

    k_bins: int
    emb_width: int
    mu: float
    threshold: float

    def setup(self):
        shape_kc = (self.k_bins, self.emb_width)
        self.k = self.variable("codebook", "k", jnp.zeros, shape_kc)
        self.k_sum = self.variable("codebook", "k_sum", jnp.zeros, shape_kc)
        self.k_elem = self.variable("codebook", "k_elem", jnp.ones, (self.k_bins,))
        self.initialized = self.variable("codebook", "initialized", lambda: jnp.zeros((), jnp.bool_))

    # -- pure pieces -----------------------------------------------------------
    def _distances(self, x_flat: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        """Squared L2 distance table [N, K] = |x|^2 - 2 x k^T + |k|^2 (MXU)."""
        x32 = x_flat.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        cross = jnp.matmul(x32, k32.T, precision=HIGHEST)
        return (jnp.sum(x32 * x32, axis=-1, keepdims=True)
                - 2.0 * cross
                + jnp.sum(k32 * k32, axis=-1)[None, :])

    def quantize(self, x_flat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        distance = self._distances(x_flat, self.k.value)
        codes = jnp.argmin(distance, axis=-1)
        min_distance = jnp.min(distance, axis=-1)
        return codes, min_distance

    def dequantize(self, codes: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.k.value, codes, axis=0)

    # -- public API ------------------------------------------------------------
    def encode(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """[B, T, C] + [B, T] -> codes [B, T] (no state update)."""
        b, t, c = x.shape
        codes, _ = self.quantize(x.reshape(b * t, c))
        return codes.reshape(b, t)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """[B, T] int -> [B, T, C] embeddings."""
        return self.dequantize(codes)

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, update_k: bool = True):
        """Quantize with straight-through; optionally update the codebook.

        x: [B, T, C]; mask: [B, T]. Returns (codes [B,T], x_q [B,T,C],
        commit_loss, metrics).
        """
        b, t, c = x.shape
        x_flat = x.reshape(b * t, c)
        m_flat = mask.reshape(b * t).astype(jnp.float32)

        if update_k:
            rng = self.make_rng("codebook")
            self._maybe_init(x_flat, m_flat, rng)

        codes, min_distance = self.quantize(x_flat)
        x_d = self.dequantize(codes)

        metrics = {}
        if update_k:
            metrics = self._update_k(x_flat, m_flat, codes, rng)

        # Reference metric quirk (bottleneck.py:126-141): the (NT,)x(NT,1)
        # broadcast makes `fit` reduce to sum(min_distance)/k_bins over ALL
        # rows including padding. Reproduced for log-comparability.
        fit = jnp.sum(min_distance) / self.k_bins
        # prenorm (reference bottleneck.py:102-104): RMS of centered valid
        # encodings. NOTE deviation: the reference computes this in
        # preprocess() but discards it at the forward call site
        # (bottleneck.py:175 `x, _, mask = self.preprocess(...)`); we log it —
        # it is the codebook-health signal the metric was written for.
        x32 = x_flat.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(m_flat) * c, 1.0)
        x_mean = jnp.sum(x32 * m_flat[:, None]) / n_valid
        prenorm = safe_sqrt(jnp.sum(((x32 - x_mean) * m_flat[:, None]) ** 2)) / safe_sqrt(n_valid)
        metrics = dict(fit=fit, prenorm=prenorm, **metrics)

        # Masked commitment loss over valid rows (bottleneck.py:194), in fp32.
        diff = (jax.lax.stop_gradient(x_d) - x_flat.astype(jnp.float32)) * m_flat[:, None]
        commit_loss = jnp.sum(diff * diff) / (jnp.maximum(jnp.sum(m_flat), 1.0) * c)

        # Straight-through estimator (codebook values follow activation dtype
        # so bf16 activations stay bf16; the fp32 codebook is state-only).
        x_d = x_d.astype(x_flat.dtype)
        x_q = x_flat + jax.lax.stop_gradient(x_d - x_flat)
        if not update_k:
            # eval-mode paranoia: block encoder gradients entirely
            # (reference bottleneck.py:230-234)
            x_q = jax.lax.stop_gradient(x_q)

        x_q = (x_q * m_flat.astype(x_q.dtype)[:, None]).reshape(b, t, c)
        return codes.reshape(b, t), x_q, commit_loss, metrics

    # -- state updates -----------------------------------------------------------
    def _maybe_init(self, x_flat: jnp.ndarray, m_flat: jnp.ndarray, rng: jax.Array) -> None:
        """Lazy data-dependent init from the first batch (reference init_k)."""
        def do_init(_):
            k_init = _sample_rows(rng, x_flat, m_flat, self.k_bins).astype(jnp.float32)
            return k_init, k_init, jnp.ones((self.k_bins,), jnp.float32)

        def keep(_):
            return self.k.value, self.k_sum.value, self.k_elem.value

        k, k_sum, k_elem = jax.lax.cond(self.initialized.value, keep, do_init, None)
        self.k.value = k
        self.k_sum.value = k_sum
        self.k_elem.value = k_elem
        self.initialized.value = jnp.ones((), jnp.bool_)

    def _update_k(self, x_flat: jnp.ndarray, m_flat: jnp.ndarray,
                  codes: jnp.ndarray, rng: jax.Array) -> dict:
        """EMA centroid update with dead-code revival (reference update_k)."""
        x32 = jax.lax.stop_gradient(x_flat).astype(jnp.float32)
        onehot = jax.nn.one_hot(codes, self.k_bins, dtype=jnp.float32) * m_flat[:, None]  # [NT, K]
        # Global-batch statistics: one big MXU matmul; pjit turns the NT
        # reduction into the cross-replica all-reduce of the reference.
        k_sum_batch = jnp.matmul(onehot.T, x32, precision=HIGHEST)  # [K, C]
        k_elem_batch = jnp.sum(onehot, axis=0)  # [K]

        k_rand = _sample_rows(jax.random.fold_in(rng, 1), x32, m_flat, self.k_bins)

        old_k = self.k.value
        k_sum = self.mu * self.k_sum.value + (1.0 - self.mu) * k_sum_batch
        k_elem = self.mu * self.k_elem.value + (1.0 - self.mu) * k_elem_batch
        usage = (k_elem[:, None] >= self.threshold).astype(jnp.float32)
        k = usage * (k_sum / jnp.maximum(k_elem[:, None], 1e-8)) + (1.0 - usage) * k_rand

        self.k.value = k
        self.k_sum.value = k_sum
        self.k_elem.value = k_elem

        k_prob = k_elem_batch / jnp.maximum(jnp.sum(k_elem_batch), 1e-8)
        entropy = -jnp.sum(k_prob * safe_log(k_prob, eps=1e-8))
        used_curr = jnp.sum(k_elem_batch >= self.threshold)
        dk = jnp.linalg.norm(k - old_k) / np.sqrt(np.prod(old_k.shape))
        return dict(entropy=entropy, used_curr=used_curr, usage=jnp.sum(usage), dk=dk)


class Bottleneck(nn.Module):
    """Per-level stack of BottleneckBlocks (reference bottleneck.py:204-238)."""

    l_bins: int
    emb_width: int
    mu: float
    levels: int
    threshold: float

    def setup(self):
        self.level_blocks = [
            BottleneckBlock(self.l_bins, self.emb_width, self.mu, self.threshold,
                            name=f"level_{level}")
            for level in range(self.levels)
        ]

    def encode(self, xs, masks):
        return [blk.encode(x, m) for blk, x, m in zip(self.level_blocks, xs, masks)]

    def decode(self, zs, start_level: int = 0, end_level: Optional[int] = None):
        if end_level is None:
            end_level = self.levels
        return [blk.decode(z) for blk, z in zip(self.level_blocks[start_level:end_level], zs)]

    def __call__(self, xs, masks, update_k: bool = True):
        zs, xs_q, commit_losses, metrics = [], [], [], []
        for blk, x, m in zip(self.level_blocks, xs, masks):
            z, x_q, commit, metric = blk(x, m, update_k=update_k)
            zs.append(z)
            xs_q.append(x_q)
            commit_losses.append(commit)
            if update_k:
                metrics.append(metric)
        return zs, xs_q, commit_losses, metrics


class NoBottleneck(nn.Module):
    """Identity passthrough (reference bottleneck.py:241-269)."""

    levels: int

    def encode(self, xs, masks):
        return xs

    def decode(self, zs, start_level: int = 0, end_level: Optional[int] = None):
        return zs

    def __call__(self, xs, masks, update_k: bool = True):
        zero = jnp.zeros(())
        commit_losses = [zero for _ in range(self.levels)]
        metrics = [dict(entropy=zero, usage=zero, used_curr=zero, fit=zero, dk=zero,
                        prenorm=zero)  # same metric keys as BottleneckBlock
                   for _ in range(self.levels)]
        return xs, xs, commit_losses, metrics
