"""Residual conv block zoo for the VQ-VAE codec (flax, NTC layout).

TPU-native rebuild of reference models/vqvae/resnet.py:16-241. All tensors
are [batch, time, channels] so channels ride the TPU lanes; convs are
``nn.Conv`` over the time axis with torch-compatible explicit padding.
Zero-initialized output projections (``zero_out``) are functional behavior
(residual branches start as identity) and are reproduced.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_mod_cycle(depth: int, cycle: Optional[int]) -> int:
    """Depth -> exponent/cycle index (reference resnet.py:9-13)."""
    return depth if cycle is None else depth % cycle


class DilatedConv1d(nn.Module):
    """Dilated conv1d evaluated as a DENSE conv over phase-decomposed time.

    XLA maps heavily-dilated 1D convs onto the MXU at ~12-17% efficiency
    (measured on v5e: the dilation-27/kernel-9 GatedHiFi branches dominated
    the train step at 23-34 TFLOP/s). A dilation-d conv is bitwise the same
    computation as a dense conv applied per phase: reshape time T -> (T/d, d)
    and convolve along the T/d axis with the d axis as a unit-kernel second
    spatial dim. Same params/shapes as nn.Conv ("kernel" [k, in, out],
    "bias"), so checkpoint trees are unchanged.

    Requires odd kernel (all reference kernels are 3 + 2*depth, resnet.py:110).
    """

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k, d = self.kernel_size, self.dilation
        if d == 1 or k == 1:
            pad = (k - 1) // 2
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), window_strides=(1,),
                padding=[(pad, pad)], dimension_numbers=("NWC", "WIO", "NWC"))
            return y + bias.astype(y.dtype)
        assert k % 2 == 1, "phase decomposition assumes odd kernels"
        b, t, c = x.shape
        extra = -t % d
        if extra:
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
        phases = x.reshape(b, (t + extra) // d, d, c)
        pp = (k - 1) // 2  # per-phase pad == ((k-1)*d//2) / d for odd k
        y = jax.lax.conv_general_dilated(
            phases, kernel[:, None].astype(x.dtype), window_strides=(1, 1),
            padding=[(pp, pp), (0, 0)], dimension_numbers=("NWHC", "WHIO", "NWHC"))
        y = y.reshape(b, t + extra, self.features)
        if extra:
            y = y[:, :t]
        return y + bias.astype(y.dtype)


class ResLayer(nn.Module):
    """dropout -> relu -> dilated conv -> dropout -> relu -> 1x1 (zero-init) with residual."""

    n_in: int
    n_state: int
    dilation: int = 1
    kernel_size: int = 3
    zero_out: bool = True
    res_scale: float = 1.0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = nn.Dropout(self.dropout, deterministic=not train)(x)
        h = nn.relu(h)
        # phase-decomposed dilated conv (same math/params as nn.Conv with
        # kernel_dilation; ~3-4x better MXU utilization at dilation 27);
        # name kept as Conv_0 for checkpoint-tree compatibility
        h = DilatedConv1d(self.n_state, self.kernel_size, self.dilation,
                          name="Conv_0")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(h)
        out_init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()
        h = nn.Conv(self.n_in, (1,), kernel_init=out_init, name="Conv_1")(h)
        return x + self.res_scale * h


class ResNetBlock(nn.Module):
    """Serial stack of dilated ResLayers (reference resnet.py:39-78)."""

    n_in: int
    n_depth: int
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    kernel_size_growth_rate: int = 2  # unused by this block; uniform ctor signature
    kernel_size_cycle: Optional[int] = None
    zero_out: bool = True
    res_scale: bool = False
    reverse_dilation: bool = False
    fused: bool = False  # fusion only exists for gated_hifi; accepted and ignored
    p_dropout: float = 0.1  # reference ResLayer rate (resnet.py:18)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = True):
        m = 1.0 if mask is None else mask
        scale = 1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth)
        depths = list(range(self.n_depth))
        if self.reverse_dilation:
            depths = depths[::-1]
        for depth in depths:
            x = ResLayer(
                self.n_in,
                int(self.m_conv * self.n_in),
                dilation=self.dilation_growth_rate ** get_mod_cycle(depth, self.dilation_cycle),
                zero_out=self.zero_out,
                res_scale=scale,
                dropout=self.p_dropout,
            )(x * m, train=train)
        return x, m


class HiFiBlock(nn.Module):
    """Parallel multi-kernel/dilation ResLayers, mean-fused (reference resnet.py:81-120)."""

    n_in: int
    n_depth: int
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    kernel_size_growth_rate: int = 2
    kernel_size_cycle: Optional[int] = None
    zero_out: bool = True
    res_scale: bool = False
    fused: bool = False  # fusion only exists for gated_hifi; accepted and ignored
    p_dropout: float = 0.1  # reference ResLayer rate (resnet.py:18)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = True):
        m = 1.0 if mask is None else mask
        scale = 1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth)
        outs = []
        for depth in range(self.n_depth):
            outs.append(
                ResLayer(
                    self.n_in,
                    int(self.m_conv * self.n_in),
                    dilation=self.dilation_growth_rate ** get_mod_cycle(depth, self.dilation_cycle),
                    kernel_size=3 + self.kernel_size_growth_rate * get_mod_cycle(depth, self.kernel_size_cycle),
                    zero_out=self.zero_out,
                    res_scale=scale,
                    dropout=self.p_dropout,
                )(x * m, train=train)
            )
        return sum(outs) / len(outs), m


class WaveNetBlock(nn.Module):
    """Gated tanh*sigmoid residual stack (reference resnet.py:123-181)."""

    n_in: int
    n_depth: int
    m_conv: float = 1.0
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    kernel_size_growth_rate: int = 2
    kernel_size_cycle: Optional[int] = None
    zero_out: bool = True
    res_scale: bool = False
    fused: bool = False  # fusion only exists for gated_hifi; accepted and ignored
    p_dropout: float = 0.0  # accepted for ctor uniformity; reference WaveNetBlock has no dropout

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = True):
        m = 1.0 if mask is None else mask
        n_hid = int(self.m_conv * self.n_in)
        scale = 1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth)
        gate_init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()

        x = nn.Conv(n_hid, (1,), name="conv_in")(x * m)
        for depth in range(self.n_depth):
            d = self.dilation_growth_rate ** get_mod_cycle(depth, self.dilation_cycle)
            z = DilatedConv1d(2 * n_hid, 3, d, name=f"conv_{depth}")(x * m)
            t, s = jnp.split(z, 2, axis=-1)
            z = jnp.tanh(t) * nn.sigmoid(s)
            z = nn.Conv(n_hid, (1,), kernel_init=gate_init, name=f"gate_{depth}")(z * m)
            x = x + scale * z
        x = nn.Conv(self.n_in, (1,), name="conv_out")(x * m)
        return x, m


class _Conv1x1Params(nn.Module):
    """Parameter container with nn.Conv's 1x1 layout (kernel [1, in, out],
    bias [out]) so checkpoint trees are identical to an nn.Conv at this name;
    the caller batches several of these into one matmul."""

    features: int
    kernel_size: int = 1
    kernel_init: Any = None

    @nn.compact
    def __call__(self, in_features: int):
        init = self.kernel_init or nn.initializers.lecun_normal()
        kernel = self.param("kernel", init,
                            (self.kernel_size, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _ResLayerParams(nn.Module):
    """Declares a ResLayer's exact param tree (Conv_0 / Conv_1) without
    running it — the fused Pallas block consumes the raw weights."""

    n_state: int
    kernel_size: int
    zero_out: bool

    @nn.compact
    def __call__(self, n_in: int):
        k0, b0 = _Conv1x1Params(self.n_state, self.kernel_size, name="Conv_0")(n_in)
        out_init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()
        k1, b1 = _Conv1x1Params(n_in, 1, kernel_init=out_init, name="Conv_1")(self.n_state)
        return k0, b0, k1, b1


class GatedHiFiBlock(nn.Module):
    """Parallel HiFi branches fused by softmax/tanh gating (reference resnet.py:184-241).

    Default block for all reference configs (block_type: gated_hifi).
    """

    n_in: int
    n_depth: int
    m_conv: float = 1.0  # unused (branches are fixed 2x width); uniform ctor signature
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    kernel_size_growth_rate: int = 2
    kernel_size_cycle: Optional[int] = None
    zero_out: bool = True
    res_scale: bool = False
    # run the whole block as one fused Pallas kernel (forward + recompute
    # backward in VMEM — see ops/pallas/gated_hifi.py). Same param tree,
    # same math at valid positions; config knob: model.fused_blocks.
    fused: bool = False
    # reference ResLayer dropout rate (resnet.py:18); honored by BOTH the
    # fused kernel and the unfused ResLayer path (one knob, one behavior)
    p_dropout: float = 0.1

    @staticmethod
    def uses_kernel(fused: bool, train: bool, p_dropout: float) -> bool:
        """Single source of truth for the kernel-vs-flax fallback: the fused
        kernel's dropout uses the TPU hardware PRNG, which has no
        interpret-mode lowering on CPU, so train-mode with dropout falls back
        to the flax path off-TPU (eval / p=0 still exercises the kernel).
        Downstream consumers (EncoderConvBlock/DecoderConvBlock pre_masked)
        must call THIS, not re-derive the predicate — the kernel emits
        sequence-masked output only when it actually runs."""
        return fused and not (train and p_dropout > 0
                              and jax.default_backend() != "tpu")

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = True):
        if self.uses_kernel(self.fused, train, self.p_dropout):
            return self._fused(x, mask, train)
        m = 1.0 if mask is None else mask
        scale = 1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth)

        # All branch 1x1 expands as ONE matmul (concat the per-branch kernels
        # at apply time — param tree unchanged): x*m is read once instead of
        # n_depth times; the branch expands measured HBM-bound on v5e.
        branch_params = [
            _Conv1x1Params(2 * self.n_in, name=f"branch_in_{depth}")(x.shape[-1])
            for depth in range(self.n_depth)
        ]
        w_all = jnp.concatenate([k[0] for k, _ in branch_params], axis=-1)  # [C, depth*2C]
        b_all = jnp.concatenate([b for _, b in branch_params], axis=-1)
        xm = x * m
        z_all = jnp.dot(xm, w_all.astype(xm.dtype)) + b_all.astype(xm.dtype)

        ts, ss = [], []
        for depth in range(self.n_depth):
            z = z_all[..., depth * 2 * self.n_in:(depth + 1) * 2 * self.n_in]
            z = ResLayer(
                2 * self.n_in,
                2 * self.n_in,
                dilation=self.dilation_growth_rate ** get_mod_cycle(depth, self.dilation_cycle),
                kernel_size=3 + self.kernel_size_growth_rate * get_mod_cycle(depth, self.kernel_size_cycle),
                zero_out=self.zero_out,
                res_scale=scale,
                dropout=self.p_dropout,
                name=f"branch_res_{depth}",
            )(z, train=train)
            t, s = jnp.split(z, 2, axis=-1)
            ts.append(t)
            ss.append(s)

        # Gate across the branch axis — tanh(t) * softmax_over_branches(s),
        # summed — WITHOUT materializing a stacked [B, depth, T, C] tensor:
        # the max/exp/sum chain below is the same stable-softmax math and
        # fuses into one elementwise pass over the n_depth branch tensors
        # (the stack + axis-softmax version measured ~7% of the train step).
        s_max = ss[0]
        for s in ss[1:]:
            s_max = jnp.maximum(s_max, s)
        exps = [jnp.exp(s - s_max) for s in ss]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        z = jnp.zeros_like(ts[0])
        for t, e in zip(ts, exps):
            z = z + jnp.tanh(t) * (e / denom)
        gate_init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()
        z = nn.Conv(self.n_in, (1,), kernel_init=gate_init, name="gate")(z * m)
        return x + scale * z, m

    def _fused(self, x: jnp.ndarray, mask: jnp.ndarray | None, train: bool):
        """One Pallas kernel for the whole block (ops/pallas/gated_hifi.py).

        Declares the identical param tree as the unfused path, then hands the
        raw weights to the fused kernel. Output equals the unfused path's
        ``out * mask`` bitwise (the kernel masks its own output per
        sequence, so downstream MaskedConvs may skip their x*mask round
        trip); in-block math is untouched. Dropout realization differs
        (hardware PRNG instead of threefry; same Bernoulli law).
        """
        from speech_masters_thesis_tpu.ops.pallas.gated_hifi import (
            GatedHiFiSpec, apply_fused_gated_hifi)

        W = self.n_in
        H = 2 * W
        depth = self.n_depth
        scale = 1.0 if not self.res_scale else 1.0 / math.sqrt(depth)
        kernels = tuple(
            3 + self.kernel_size_growth_rate * get_mod_cycle(d, self.kernel_size_cycle)
            for d in range(depth))
        dilations = tuple(
            self.dilation_growth_rate ** get_mod_cycle(d, self.dilation_cycle)
            for d in range(depth))

        branch_in = [_Conv1x1Params(H, name=f"branch_in_{d}")(x.shape[-1])
                     for d in range(depth)]
        wall = jnp.concatenate([k[0] for k, _ in branch_in], axis=-1)     # [W, 4H]
        ball = jnp.concatenate([b for _, b in branch_in], axis=-1)[None]  # [1, 4H]
        res = [_ResLayerParams(H, kernels[d], self.zero_out,
                               name=f"branch_res_{d}")(H) for d in range(depth)]
        ks = tuple(r[0] for r in res)
        bs = tuple(r[1][None] for r in res)
        w1s = tuple(r[2][0] for r in res)
        b1s = tuple(r[3][None] for r in res)
        gate_init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()
        kg, bg = _Conv1x1Params(W, 1, kernel_init=gate_init, name="gate")(W)
        wg, bg = kg[0], bg[None]

        p = self.p_dropout if train else 0.0
        if p > 0.0:
            seed_bits = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
            seed_f32 = jax.lax.bitcast_convert_type(seed_bits, jnp.float32)
        else:
            seed_f32 = jnp.float32(0.0)

        import os
        # tile defaults from the v5e sweep recorded in BASELINE.md: fwd 384 /
        # bwd 768 won at 129.1 ms in bf16; bwd >= 896 exceeds the 16MB
        # scoped-VMEM limit. fp32 activations double the VMEM footprint, so
        # the backward tile halves to stay under the same limit.
        default_bwd = 768 if x.dtype == jnp.bfloat16 else 384
        spec = GatedHiFiSpec(
            n_in=W, kernels=kernels, dilations=dilations, res_scale=scale,
            p_drop=float(p),
            tile_fwd=int(os.environ.get("GH_TILE_FWD", 384)),
            tile_bwd=int(os.environ.get("GH_TILE_BWD", default_bwd)),
            interpret=jax.default_backend() != "tpu",
        )
        spec.check()
        m = 1.0 if mask is None else mask
        if mask is None:
            lens = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        else:
            lens = jnp.sum(mask[..., 0], axis=1).astype(jnp.int32)
        out = apply_fused_gated_hifi(spec, seed_f32, lens, x * m, wall, ball,
                                     ks, bs, w1s, b1s, wg, bg)
        return out, m


BLOCKS = {
    "base": ResNetBlock,
    "wavenet": WaveNetBlock,
    "hifi": HiFiBlock,
    "gated_hifi": GatedHiFiBlock,
}


def get_block(block_type: str):
    if block_type not in BLOCKS:
        raise ValueError(f"Unknown block_type={block_type}; known: {sorted(BLOCKS)}")
    return BLOCKS[block_type]
