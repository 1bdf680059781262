"""VQ-VAE hierarchical conv encoder/decoder (flax, NTC).

Rebuild of reference models/vqvae/conv.py and encdec.py:
  * masked strided convs that subsample the mask along with the signal
  * per-down-step residual blocks from the block zoo
  * mirrored transposed-conv upsampling in the decoder

Strided downsampling uses filter = 2*stride, pad = stride//2 so lengths
divide exactly (reference conv.py:61); the transposed conv uses the matching
geometry so decoder lengths are exactly T * stride**down.

TPU perf knob ``folded`` (config ``model.folded_convs``): reformulates the
stride-s convs through a space-to-depth fold. In NTC layout the fold/unfold
reshapes are layout-trivial (pure minor-dim merges, no data movement):

  * strided conv: x [B, T, C] -> [B, T/s, s*C], then a dense stride-1 conv
    whose folded kernel scatters the original taps — the contraction dim
    grows s-fold (64 -> 128 here), filling the MXU, and XLA's strided-conv
    lowering (windowed gathers) disappears.
  * conv-transpose: a dense stride-1 conv producing [B, T, s*F] (sub-pixel
    channels), then reshape -> [B, s*T, F]. This removes the
    input-dilation + kernel-reverse lowering of lax.conv_transpose (the
    ``reverse`` HLOs measured ~5 ms/step at batch 32, BASELINE.md).

Identical parameters (same tree, same shapes); same math up to f32
accumulation order. MEASURED AND REJECTED on v5e at the shipped bench
config (BASELINE.md): folding adds 1.5x arithmetic to these convs (the
scattered zero taps) and loses more than the lowering win — step 119.8 ->
123.8 ms (both), 123.1 ms (transposes only). Kept behind the default-off
``model.folded_convs`` knob as the recorded experiment.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_masters_thesis_tpu.models.vqvae.blocks import GatedHiFiBlock, get_block


def _fold_conv(x: jnp.ndarray, kernel: jnp.ndarray, k: int, s: int, p: int):
    """Stride-s conv via space-to-depth: out[t] = sum_j w[j] x[s*t + j - p].

    x: [B, T, C] with T % s == 0; kernel: [k, C, F].
    Returns [B, T//s, F] (bias not added).
    """
    B, T, C = x.shape
    F = kernel.shape[-1]
    d_min = (-p) // s                                        # python // floors
    d_max = (k - 1 - p) // s
    kp = d_max - d_min + 1
    fk = jnp.zeros((kp, s * C, F), kernel.dtype)
    for j in range(k):
        d, r = (j - p) // s, (j - p) % s
        fk = fk.at[d - d_min, r * C:(r + 1) * C, :].set(kernel[j])
    x_fold = x.reshape(B, T // s, s * C)                     # layout-trivial
    return jax.lax.conv_general_dilated(
        x_fold, fk, window_strides=(1,), padding=[(-d_min, d_max)],
        dimension_numbers=("NWC", "WIO", "NWC"))


def _fold_conv_transpose(x: jnp.ndarray, kernel: jnp.ndarray, k: int, s: int, p: int):
    """Stride-s transposed conv via sub-pixel channels.

    torch semantics: out[s*t + j - p] += x[t] @ w[j]^T, out_len = s*T for
    k = 2s, p = s//2 (the only geometry the codec uses, but the code is
    general for out_len = (T-1)*s - 2p + k == s*T).
    x: [B, T, C]; kernel: [k, F, C] (ConvTranspose1d layout).
    Returns [B, s*T, F] (bias not added).
    """
    B, T, C = x.shape
    F = kernel.shape[1]
    assert (k - 2 * p) == s, "sub-pixel fold requires out_len == s*T"
    # out[s*t' + r] = sum_d x[t' - d] @ w[s*d + r + p]^T
    ds = sorted({(j - r - p) // s for j in range(k) for r in range(s)
                 if (j - r - p) % s == 0})
    d_min, d_max = ds[0], ds[-1]
    kp = d_max - d_min + 1
    fk = jnp.zeros((kp, C, s * F), kernel.dtype)
    for r in range(s):
        for j in range(k):
            if (j - r - p) % s != 0:
                continue
            d = (j - r - p) // s
            # conv index i' = d_max - d so that x[t + i' - pad_l] == x[t - d]
            fk = fk.at[d_max - d, :, r * F:(r + 1) * F].set(kernel[j].T)
    y = jax.lax.conv_general_dilated(
        x, fk, window_strides=(1,), padding=[(d_max, -d_min)],
        dimension_numbers=("NWC", "WIO", "NWC"))             # [B, T, s*F]
    return y.reshape(B, s * T, F)                            # layout-trivial


class ConvTranspose1d(nn.Module):
    """Torch-semantics ConvTranspose1d: out_len = (T-1)*stride - 2*pad + kernel."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.features, in_features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.folded and self.stride > 1 \
                and self.kernel_size - 2 * self.padding == self.stride:
            return _fold_conv_transpose(
                x, kernel, self.kernel_size, self.stride, self.padding) + bias
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_transpose(
            x, kernel,
            strides=(self.stride,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            transpose_kernel=True,
        )
        return y + bias


class _ConvParams(nn.Module):
    """Declares nn.Conv's exact param tree (kernel [k, in, out], bias [out])
    without running it, so the folded path stays checkpoint-identical."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MaskedConv1d(nn.Module):
    """Conv over masked input; mask is stride-subsampled (reference conv.py:5-10).

    ``pre_masked`` skips the x*mask multiply when the producer already
    emitted per-sequence-masked values (the fused GatedHiFi kernel masks its
    own output) — one less full HBM round trip per conv, identical values.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    folded: bool = False
    pre_masked: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        xm = x if self.pre_masked else x * mask
        if self.folded and self.stride > 1 and x.shape[1] % self.stride == 0:
            kernel, bias = _ConvParams(self.features, self.kernel_size,
                                       name="Conv_0")(x.shape[-1])
            y = _fold_conv(xm, kernel.astype(x.dtype),
                           self.kernel_size, self.stride, self.padding)
            return y + bias.astype(y.dtype), mask[:, ::self.stride]
        x = nn.Conv(
            self.features, (self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
        )(xm)
        return x, mask[:, ::self.stride]


class MaskedConvTranspose1d(nn.Module):
    """Transposed conv over masked input; mask is repeated (reference conv.py:13-18)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    folded: bool = False
    pre_masked: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        xm = x if self.pre_masked else x * mask
        x = ConvTranspose1d(self.features, self.kernel_size, self.stride,
                            self.padding, folded=self.folded)(xm)
        return x, jnp.repeat(mask, self.stride, axis=1)


class EncoderConvBlock(nn.Module):
    """down_t x (strided masked conv + residual block), then 3x1 out conv."""

    input_emb_width: int
    output_emb_width: int
    down_t: int
    stride_t: int
    block_type: str
    width: int
    depth: int
    m_conv: float
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    kernel_size_growth_rate: int = 2
    kernel_size_cycle: Optional[int] = None
    zero_out: bool = True
    res_scale: bool = False
    fused: bool = False
    folded: bool = False
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True):
        if self.down_t <= 0:
            return x, mask
        Block = get_block(self.block_type)
        # fused gated_hifi blocks emit per-sequence-masked output; the conv
        # that consumes it can skip its own x*mask. The kernel-vs-flax
        # predicate lives in ONE place: GatedHiFiBlock.uses_kernel.
        blocks_mask_output = (self.block_type == "gated_hifi"
                              and GatedHiFiBlock.uses_kernel(
                                  self.fused, train, self.p_dropout))
        filter_t, pad_t = self.stride_t * 2, self.stride_t // 2
        for i in range(self.down_t):
            x, mask = MaskedConv1d(self.width, filter_t, self.stride_t, pad_t,
                                   folded=self.folded,
                                   pre_masked=blocks_mask_output and i > 0)(x, mask)
            x, mask = Block(
                self.width, self.depth, m_conv=self.m_conv,
                dilation_growth_rate=self.dilation_growth_rate,
                dilation_cycle=self.dilation_cycle,
                kernel_size_growth_rate=self.kernel_size_growth_rate,
                kernel_size_cycle=self.kernel_size_cycle,
                zero_out=self.zero_out, res_scale=self.res_scale,
                fused=self.fused, p_dropout=self.p_dropout,
            )(x, mask, train=train)
        x, mask = MaskedConv1d(self.output_emb_width, 3, 1, 1,
                               pre_masked=blocks_mask_output)(x, mask)
        return x, mask


class DecoderConvBlock(nn.Module):
    """3x1 in conv, then down_t x (residual block + strided masked transposed conv)."""

    input_emb_width: int
    output_emb_width: int
    down_t: int
    stride_t: int
    block_type: str
    width: int
    depth: int
    m_conv: float
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    kernel_size_growth_rate: int = 2
    kernel_size_cycle: Optional[int] = None
    zero_out: bool = True
    res_scale: bool = False
    reverse_decoder_dilation: bool = False
    fused: bool = False
    folded: bool = False
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True):
        if self.down_t <= 0:
            return x, mask
        Block = get_block(self.block_type)
        filter_t, pad_t = self.stride_t * 2, self.stride_t // 2
        x, mask = MaskedConv1d(self.width, 3, 1, 1)(x, mask)
        for i in range(self.down_t):
            block_kwargs = dict(
                m_conv=self.m_conv,
                dilation_growth_rate=self.dilation_growth_rate,
                dilation_cycle=self.dilation_cycle,
                kernel_size_growth_rate=self.kernel_size_growth_rate,
                kernel_size_cycle=self.kernel_size_cycle,
                zero_out=self.zero_out, res_scale=self.res_scale,
                p_dropout=self.p_dropout,
            )
            if self.block_type == "base":
                block_kwargs["reverse_dilation"] = self.reverse_decoder_dilation
            block_kwargs["fused"] = self.fused
            x, mask = Block(self.width, self.depth, **block_kwargs)(x, mask, train=train)
            out_width = self.input_emb_width if i == (self.down_t - 1) else self.width
            x, mask = MaskedConvTranspose1d(
                out_width, filter_t, self.stride_t, pad_t, folded=self.folded,
                pre_masked=(self.block_type == "gated_hifi"
                            and GatedHiFiBlock.uses_kernel(
                                self.fused, train, self.p_dropout)))(x, mask)
        return x, mask


class Encoder(nn.Module):
    """Multi-level encoder; level L output is downsampled prod(stride**down) x.

    Reference models/vqvae/encdec.py:6-40. NOTE on ``reverse_decoder_dilation``:
    it is decoder-only in the reference and stripped from encoder kwargs
    (encdec.py:16-18); callers here simply don't pass it.
    """

    input_emb_width: int
    output_emb_width: int
    levels: int
    downs_t: Sequence[int]
    strides_t: Sequence[int]
    block_type: str
    width: int
    depth: int
    m_conv: float
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    kernel_size_growth_rate: int = 2
    kernel_size_cycle: Optional[int] = None
    zero_out: bool = True
    res_scale: bool = False
    # rematerialize each level in the backward pass: trades ~1.3x flops for
    # activation memory, unlocking larger batches (3s clips at batch 32 OOM
    # a 16GB-HBM chip without it)
    remat: bool = False
    # run gated_hifi blocks as fused Pallas kernels (ops/pallas/gated_hifi.py)
    fused: bool = False
    # space-to-depth/sub-pixel strided convs (see module docstring)
    folded: bool = False
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool = True):
        """x: [B, T, input_emb_width]; mask: [B, T, 1] -> ([B, T', C], [B, T', 1])."""
        block_cls = EncoderConvBlock
        if self.remat:
            block_cls = nn.remat(EncoderConvBlock, static_argnums=(3,))  # (self, x, mask, train)
        for level, down_t, stride_t in zip(range(self.levels), self.downs_t, self.strides_t):
            x, mask = block_cls(
                self.input_emb_width if level == 0 else self.output_emb_width,
                self.output_emb_width,
                down_t, stride_t, self.block_type,
                self.width, self.depth, self.m_conv,
                dilation_growth_rate=self.dilation_growth_rate,
                dilation_cycle=self.dilation_cycle,
                kernel_size_growth_rate=self.kernel_size_growth_rate,
                kernel_size_cycle=self.kernel_size_cycle,
                zero_out=self.zero_out, res_scale=self.res_scale,
                fused=self.fused, folded=self.folded, p_dropout=self.p_dropout,
                name=f"level_{level}",
            )(x, mask, train)
        return x, mask


class Decoder(nn.Module):
    """Mirrored multi-level decoder with optional cross-level skip sums.

    Reference models/vqvae/encdec.py:43-83.
    """

    input_emb_width: int
    output_emb_width: int
    levels: int
    downs_t: Sequence[int]
    strides_t: Sequence[int]
    block_type: str
    width: int
    depth: int
    m_conv: float
    dilation_growth_rate: int = 1
    dilation_cycle: Optional[int] = None
    kernel_size_growth_rate: int = 2
    kernel_size_cycle: Optional[int] = None
    zero_out: bool = True
    res_scale: bool = False
    reverse_decoder_dilation: bool = False
    remat: bool = False
    fused: bool = False
    folded: bool = False
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], masks: Sequence[jnp.ndarray],
                 all_levels: bool = True, train: bool = True):
        if all_levels:
            assert len(xs) == len(masks) == self.levels
        else:
            assert len(xs) == len(masks) == 1
        block_cls = DecoderConvBlock
        if self.remat:
            block_cls = nn.remat(DecoderConvBlock, static_argnums=(3,))  # (self, x, mask, train)
        x, mask = xs[-1], masks[-1]
        for level, down_t, stride_t in reversed(
                list(zip(range(self.levels), self.downs_t, self.strides_t))):
            x, mask = block_cls(
                self.output_emb_width,
                self.output_emb_width,
                down_t, stride_t, self.block_type,
                self.width, self.depth, self.m_conv,
                dilation_growth_rate=self.dilation_growth_rate,
                dilation_cycle=self.dilation_cycle,
                kernel_size_growth_rate=self.kernel_size_growth_rate,
                kernel_size_cycle=self.kernel_size_cycle,
                zero_out=self.zero_out, res_scale=self.res_scale,
                reverse_decoder_dilation=self.reverse_decoder_dilation,
                fused=self.fused, folded=self.folded, p_dropout=self.p_dropout,
                name=f"level_{level}",
            )(x, mask, train)
            if level != 0 and all_levels:
                x = x + xs[level - 1]
        x = nn.Conv(self.input_emb_width, (1,), name="out")(x * mask)
        return x, mask
