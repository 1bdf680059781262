"""Invertible flow layers for Glow-TTS (flax, NTC).

Rebuild of reference models/glow_tts/submodules.py:167-400:
  * ActNorm with data-dependent init (DDI): init statistics are computed
    *inside* a dedicated ddi pass (mutable 'ddi_stats' collection) and then
    grafted into params host-side — replacing the reference's in-place
    buffer mutation + checkpoint-as-broadcast dance (train.py:409-420).
  * InvConvNear: invertible grouped 1x1 conv (QR-initialized, det > 0) with
    closed-form log|det|; the 4x4 inverse in the reverse pass is computed
    on the fly (jnp.linalg.inv on a tiny matrix).
  * CouplingBlock: affine coupling with a weight-normalized WaveNet
    conditioner; the gated tanh*sigmoid fuse is a single XLA fusion (the
    reference needed a TorchScript kernel for this, submodules.py:88-95).

All layers share the signature (x, mask, g=None, reverse=False, ddi=False)
-> (z, logdet). x is [B, T, C]; mask [B, T, 1].
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class WNConv1d(nn.Module):
    """Weight-normalized conv1d: w = g * v / ||v|| per output channel.

    Matches torch.nn.utils.weight_norm(Conv1d) (norm over in x kernel dims),
    used throughout the reference WN conditioner (submodules.py:183-206).
    """

    features: int
    kernel_size: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray | None = None, *,
                 in_features: int | None = None, return_params: bool = False):
        in_features = x.shape[-1] if x is not None else in_features
        v = self.param("v", nn.initializers.lecun_normal(),
                       (self.kernel_size, in_features, self.features))
        # torch init: g = ||w||; with lecun-init v this starts near ||v||
        g = self.param("g", lambda key, shape: jnp.linalg.norm(
            v.reshape(-1, self.features), axis=0), (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.has_variable("flow_cache", "kernel"):
            # inference-time weight-norm fold (reference remove_weight_norm,
            # submodules.py:233-238): the caller precomputed the normalized
            # kernel once (build_flow_cache) — skip the per-call norm
            kernel = self.get_variable("flow_cache", "kernel")
        else:
            norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
            kernel = v * (g / jnp.maximum(norm, 1e-12))[None, None, :]
            # collected only when the caller passes mutable=["flow_cache"];
            # never during init (a cache leaked into the initial variables
            # would silently bypass the live params after training updates)
            if not self.is_initializing():
                self.sow("flow_cache", "kernel", kernel, reduce_fn=lambda a, b: b)
        if return_params:
            # fused-kernel path (ops/pallas/wn_coupling.py): hand back the
            # normalized weights instead of running the conv; grads flow
            # through the normalization by ordinary autodiff
            return kernel, bias
        pad = ((self.kernel_size - 1) * self.dilation) // 2
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class ActNorm(nn.Module):
    """Per-channel affine with DDI (reference submodules.py:241-286).

    setup-style so the fused flow-step path (encoder.py/FlowSpecDecoder) can
    read the params without running the layer."""

    channels: int

    def setup(self):
        self.logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.channels,))

    def __call__(self, x, mask=None, g=None, reverse: bool = False, ddi: bool = False):
        if mask is None:
            mask = jnp.ones((x.shape[0], x.shape[1], 1), x.dtype)
        logs = self.logs
        bias = self.bias

        if ddi:
            # masked per-channel mean/var of the incoming activations
            denom = jnp.maximum(jnp.sum(mask, axis=(0, 1)), 1.0)
            m = jnp.sum(x * mask, axis=(0, 1)) / denom
            m_sq = jnp.sum(x * x * mask, axis=(0, 1)) / denom
            v = m_sq - m * m
            logs_init = -0.5 * jnp.log(jnp.clip(v, min=1e-6))
            bias_init = -m * jnp.exp(logs_init)
            # expose for host-side grafting into params (train.py ddi flow)
            self.sow("ddi_stats", "logs", logs_init, reduce_fn=lambda a, b: b)
            self.sow("ddi_stats", "bias", bias_init, reduce_fn=lambda a, b: b)
            logs, bias = logs_init, bias_init

        x_len = jnp.sum(mask, axis=(1, 2))  # [b]
        if reverse:
            z = (x - bias) * jnp.exp(-logs) * mask
            logdet = None
        else:
            z = (bias + jnp.exp(logs) * x) * mask
            logdet = jnp.sum(logs) * x_len
        return z, logdet


def _invconv_qr_init(key, shape):
    w = jax.random.normal(key, shape)
    q = jnp.linalg.qr(w)[0]
    # fix determinant sign to +1
    q = jnp.where(jnp.linalg.det(q) < 0, q.at[:, 0].multiply(-1.0), q)
    return q


def build_flow_cache(model, variables: dict, *args, method=None, **kwargs) -> dict:
    """Inference-time flow caching — the TPU-native equivalent of the
    reference's ``store_inverse`` (submodules.py:289-336) + then
    ``remove_weight_norm`` (submodules.py:233-238).

    Runs ONE apply of the generation path with ``mutable=["flow_cache"]``;
    every InvConvNear sows its precomputed inverse and every WNConv1d its
    folded (normalized) kernel. Returns ``variables`` extended with the
    ``flow_cache`` collection — subsequent applies read the cached values
    and the steady-state program contains no LU solve / weight-norm fold
    (tests/test_flow_cache.py asserts this on the optimized HLO).
    """
    _, mutated = model.apply(variables, *args, method=method,
                             mutable=["flow_cache"], **kwargs)
    return {**variables, "flow_cache": mutated["flow_cache"]}


def _invconv_group_indices(c: int, s: int):
    """Static (group-slot, group-position) of each channel under the
    reference's (2, c//s, s//2) regrouping (submodules.py:312-313)."""
    j = np.arange(c)
    u = j // (c // 2)
    rem = j % (c // 2)
    v = rem // (s // 2)
    w = rem % (s // 2)
    return u * (s // 2) + w, v


class InvConvNear(nn.Module):
    """Invertible grouped 1x1 conv over n_split-sized channel groups.

    setup-style so the fused flow-step path can read ``weight`` and build
    the dense channel-mix matrix without running the layer."""

    channels: int
    n_split: int = 4
    no_jacobian: bool = False

    def setup(self):
        self.weight = self.param("weight", _invconv_qr_init,
                                 (self.n_split, self.n_split))

    def dense_matrix_t(self, dtype) -> jnp.ndarray:
        """[C, C] dense equivalent TRANSPOSED: invconv(x) == x @ M^T.

        M[i, j] = weight[g(i), g(j)] when channels i, j share a group
        position, else 0. Built by (differentiable) gather so the fused
        kernel's cotangent on M flows back to the 4x4 weight by autodiff.
        """
        g, v = _invconv_group_indices(self.channels, self.n_split)
        m = self.weight[g[:, None], g[None, :]] \
            * jnp.asarray(v[:, None] == v[None, :], self.weight.dtype)
        return m.T.astype(dtype)

    def __call__(self, x, mask=None, g=None, reverse: bool = False, ddi: bool = False):
        b, t, c = x.shape
        assert c % self.n_split == 0
        weight = self.weight

        if mask is None:
            mask = jnp.ones((b, t, 1), x.dtype)
            x_len = jnp.full((b,), t, x.dtype)
        else:
            x_len = jnp.sum(mask, axis=(1, 2))

        # channel grouping identical to reference submodules.py:312-313:
        # c factors as (2, c//s, s//2); group axis = (half, within-half)
        s = self.n_split
        xg = x.reshape(b, t, 2, c // s, s // 2)
        xg = xg.transpose(0, 1, 2, 4, 3).reshape(b, t, s, c // s)

        # the n_split x n_split matrix ops run in fp32 regardless of the
        # activation dtype (lapack slogdet/inv have no bf16 kernels, and a
        # 4x4 determinant wants full precision anyway)
        w32 = weight.astype(jnp.float32)
        if reverse:
            if self.has_variable("flow_cache", "weight_inv"):
                # inference-time stored inverse (reference store_inverse,
                # submodules.py:289-336): precomputed by build_flow_cache —
                # no LU solve in the steady-state generation program
                w_inv = self.get_variable("flow_cache", "weight_inv")
            else:
                w_inv = jnp.linalg.inv(w32)
                if not self.is_initializing():  # see WNConv1d note
                    self.sow("flow_cache", "weight_inv", w_inv,
                             reduce_fn=lambda a, b: b)
            w = w_inv.astype(x.dtype)
            logdet = None
        else:
            w = w32.astype(x.dtype)
            if self.no_jacobian:
                logdet = 0
            else:
                _, slogdet = jnp.linalg.slogdet(w32)
                # torch.logdet returns sign*|det| log; det>0 by construction
                logdet = slogdet * (c / s) * x_len.astype(jnp.float32)

        z = jnp.einsum("btsc,ks->btkc", xg, w)
        z = z.reshape(b, t, 2, s // 2, c // s).transpose(0, 1, 2, 4, 3).reshape(b, t, c)
        return z * mask, logdet


class WN(nn.Module):
    """WaveNet conditioner with weight-norm and gated activations."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask=None, g=None, train: bool = True):
        assert self.kernel_size % 2 == 1
        assert self.hidden_channels % 2 == 0
        if mask is None:
            mask = 1.0
        output = jnp.zeros_like(x)

        if g is not None:
            g = WNConv1d(2 * self.hidden_channels * self.n_layers, 1, name="cond_layer")(g)

        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = WNConv1d(2 * self.hidden_channels, self.kernel_size, dilation,
                            name=f"in_{i}")(x)
            x_in = nn.Dropout(self.p_dropout, deterministic=not train)(x_in)
            if g is not None:
                g_l = g[..., i * 2 * self.hidden_channels:(i + 1) * 2 * self.hidden_channels]
            else:
                g_l = jnp.zeros_like(x_in)
            # fused add-tanh-sigmoid gate: plain jnp; XLA fuses it into one
            # elementwise kernel (the reference's TorchScript trick)
            z = x_in + g_l
            acts = jnp.tanh(z[..., :self.hidden_channels]) * nn.sigmoid(z[..., self.hidden_channels:])

            res_skip_channels = 2 * self.hidden_channels if i < self.n_layers - 1 else self.hidden_channels
            res_skip = WNConv1d(res_skip_channels, 1, name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :self.hidden_channels]) * mask
                output = output + res_skip[..., self.hidden_channels:]
            else:
                output = output + res_skip
        return output * mask


class _WNParams(nn.Module):
    """Declares the WN conditioner's exact param tree (in_i / res_skip_i)
    without running it — the fused Pallas kernel consumes the normalized
    weights directly. Named "wn" so checkpoints are interchangeable with
    the unfused path."""

    hidden_channels: int
    kernel_size: int
    n_layers: int

    @nn.compact
    def __call__(self):
        H = self.hidden_channels
        wins, bins, wrss, brss = [], [], [], []
        for i in range(self.n_layers):
            k, b = WNConv1d(2 * H, self.kernel_size, name=f"in_{i}")(
                in_features=H, return_params=True)
            wins.append(k)                      # [k, H, 2H]
            bins.append(b[None])                # [1, 2H]
            rs_ch = 2 * H if i < self.n_layers - 1 else H
            k, b = WNConv1d(rs_ch, 1, name=f"res_skip_{i}")(
                in_features=H, return_params=True)
            wrss.append(k[0])                   # [H, rs_ch]
            brss.append(b[None])
        return wins, bins, wrss, brss


class _EndConvParams(nn.Module):
    """Zero-init end conv params with nn.Conv's names (kernel/bias)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.zeros,
                            (1, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel[0], bias[None]


class CouplingBlock(nn.Module):
    """Affine coupling: transform the second channel half conditioned on the first."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    sigmoid_scale: bool = False
    # run the conditioner (start + WN + end) as one fused Pallas kernel
    # (ops/pallas/wn_coupling.py); config knob: model.fused_blocks
    fused: bool = False
    # largest squeezed sequence the fused kernel handles per batch element
    # (whole-sequence-in-VMEM design; beyond this, fall back to flax)
    fused_max_t: int = 768

    @nn.compact
    def __call__(self, x, mask=None, g=None, reverse: bool = False,
                 ddi: bool = False, train: bool = True, prefix=None):
        """prefix=(actnorm_logs, actnorm_bias, invconv_mt): run the WHOLE
        flow step (ActNorm -> InvConvNear -> coupling) as one fused Pallas
        kernel (ops/pallas/wn_coupling.py:fused_flow_step). Only the decoder
        passes this, and only when the fused conditions hold."""
        if mask is None:
            mask = 1.0
        half = self.in_channels // 2

        if prefix is not None:
            assert not reverse and g is None
            xc, out = self._fused_flow_step(x, mask, prefix, train)
            x_0, x_1 = xc[..., :half], xc[..., half:]
        else:
            x_0, x_1 = x[..., :half], x[..., half:]
            use_fused = (self.fused and g is None and x.shape[1] <= self.fused_max_t)
            if use_fused and train and self.p_dropout > 0 \
                    and jax.default_backend() != "tpu":
                # the fused kernel's dropout needs the TPU hardware PRNG (no
                # interpret-mode lowering); train-mode falls back off-TPU
                use_fused = False
            if use_fused:
                out = self._fused_conditioner(x_0, mask, train)
            else:
                out = self._flax_conditioner(x_0, mask, g, train)

        m = out[..., :half]
        logs = out[..., half:]
        if self.sigmoid_scale:
            logs = jnp.log(1e-6 + nn.sigmoid(logs + 2))

        if reverse:
            z_1 = (x_1 - m) * jnp.exp(-logs) * mask
            logdet = None
        else:
            z_1 = (m + jnp.exp(logs) * x_1) * mask
            logdet = jnp.sum(logs * mask, axis=(1, 2))

        return jnp.concatenate([x_0, z_1], axis=-1), logdet

    def _flax_conditioner(self, x_0, mask, g, train):
        h = WNConv1d(self.hidden_channels, 1, name="start")(x_0) * mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, self.p_dropout, self.gin_channels, name="wn")(
                   h, mask, g, train=train)
        # zero-init end conv: coupling starts as identity (submodules.py:365-370)
        return nn.Conv(self.in_channels, (1,), kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="end")(h)

    def _fused_flow_step(self, x, mask, prefix, train):
        """ActNorm + InvConvNear + conditioner as ONE Pallas kernel.

        Returns (xc, out): the invconv output (for the affine/passthrough)
        and the conditioner output. Param trees: the prefix params belong to
        the sibling ActNorm/InvConvNear modules (the decoder reads them);
        the conditioner params are declared here exactly as in
        _fused_conditioner (checkpoints interchangeable with every path).
        """
        from speech_masters_thesis_tpu.ops.pallas.wn_coupling import (
            WNSpec, apply_fused_flow_step)

        aln, alb, mt = prefix
        B, T, _ = x.shape
        ks, bs_ = WNConv1d(self.hidden_channels, 1, name="start")(
            in_features=self.in_channels // 2, return_params=True)
        ws, bs = ks[0], bs_[None]
        wins, bins, wrss, brss = _WNParams(
            self.hidden_channels, self.kernel_size, self.n_layers, name="wn")()
        wend, bend = _EndConvParams(self.in_channels, name="end")(self.hidden_channels)

        p = self.p_dropout if train else 0.0
        if p > 0.0:
            seed_bits = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
            seed_f32 = jax.lax.bitcast_convert_type(seed_bits, jnp.float32)
        else:
            seed_f32 = jnp.float32(0.0)

        if isinstance(mask, (int, float)):
            lens = jnp.full((B,), T, jnp.int32)
        else:
            lens = jnp.sum(mask[..., 0], axis=1).astype(jnp.int32)

        spec = WNSpec(
            half=self.in_channels // 2, hidden=self.hidden_channels,
            out_channels=self.in_channels, kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate, n_layers=self.n_layers,
            p_drop=float(p), interpret=jax.default_backend() != "tpu",
        )
        # prefix params pass through in f32 (the kernel computes in f32 and
        # casts only dot operands) so their custom_vjp cotangents stay f32
        return apply_fused_flow_step(
            spec, seed_f32, lens, x,
            aln.reshape(1, -1).astype(jnp.float32),
            alb.reshape(1, -1).astype(jnp.float32),
            mt.astype(jnp.float32), ws, bs, tuple(wins), tuple(bins),
            tuple(wrss), tuple(brss), wend, bend)

    def _fused_conditioner(self, x_0, mask, train):
        """One Pallas kernel for start + WN + end (ops/pallas/wn_coupling.py).

        Identical param tree to the flax path (checkpoints interchangeable);
        identical math at valid positions; dropout uses the hardware PRNG
        (same Bernoulli law, different realization than threefry).
        """
        from speech_masters_thesis_tpu.ops.pallas.wn_coupling import (
            WNSpec, apply_fused_wn_coupling)

        B, T, _ = x_0.shape
        ks, bs_ = WNConv1d(self.hidden_channels, 1, name="start")(
            in_features=x_0.shape[-1], return_params=True)
        ws, bs = ks[0], bs_[None]
        wins, bins, wrss, brss = _WNParams(
            self.hidden_channels, self.kernel_size, self.n_layers, name="wn")()
        wend, bend = _EndConvParams(self.in_channels, name="end")(self.hidden_channels)

        p = self.p_dropout if train else 0.0
        if p > 0.0:
            seed_bits = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
            seed_f32 = jax.lax.bitcast_convert_type(seed_bits, jnp.float32)
        else:
            seed_f32 = jnp.float32(0.0)

        if isinstance(mask, (int, float)):
            lens = jnp.full((B,), T, jnp.int32)
        else:
            lens = jnp.sum(mask[..., 0], axis=1).astype(jnp.int32)

        spec = WNSpec(
            half=x_0.shape[-1], hidden=self.hidden_channels,
            out_channels=self.in_channels, kernel_size=self.kernel_size,
            dilation_rate=self.dilation_rate, n_layers=self.n_layers,
            p_drop=float(p), interpret=jax.default_backend() != "tpu",
        )
        return apply_fused_wn_coupling(spec, seed_f32, lens, x_0, ws, bs,
                                       tuple(wins), tuple(bins),
                                       tuple(wrss), tuple(brss), wend, bend)
