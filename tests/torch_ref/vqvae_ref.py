"""Reference-semantics PyTorch VQ-VAE — cross-framework parity oracle.

Test-only code (never imported by the package). Re-implements, in torch, the
observable behavior of the reference VQ-VAE stack:

  * masked strided convs        /root/reference/models/vqvae/conv.py:5-18
  * ResLayer / block zoo        /root/reference/models/vqvae/resnet.py
  * Encoder/Decoder             /root/reference/models/vqvae/encdec.py
  * EMA k-means bottleneck      /root/reference/models/vqvae/bottleneck.py
  * STFT + losses               /root/reference/datasets/transforms.py:71-123,
                                /root/reference/models/vqvae/losses.py

The nn.Module attribute names follow the reference so ``state_dict()`` keys
are byte-identical to a real reference checkpoint — that is the test: a
random-initialized oracle's state_dict goes through
tools/import_torch_checkpoint.py and the flax model must produce bitwise
VQ code indices and matching activations. Written from the behavior spec,
not transcribed; dropout layers exist only for state_dict/key fidelity
(parity runs use .eval()).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _zero_(conv: nn.Conv1d) -> None:
    nn.init.zeros_(conv.weight)
    nn.init.zeros_(conv.bias)


def _cycle(depth: int, cycle) -> int:
    return depth if cycle is None else depth % cycle


class MaskedConv1d(nn.Conv1d):
    """Conv over mask-multiplied input; subsamples the mask by the stride."""

    def forward(self, x, mask):  # pylint: disable=arguments-differ
        return super().forward(x * mask), mask[:, :, ::self.stride[0]]


class MaskedConvTranspose1d(nn.ConvTranspose1d):
    def forward(self, x, mask):  # pylint: disable=arguments-differ
        return super().forward(x * mask), mask.repeat_interleave(self.stride[0], dim=-1)


class ResLayer(nn.Module):
    """dropout-relu-dilated conv-dropout-relu-1x1(zero-init), residual add.

    ``model`` is an nn.Sequential so parameter keys are model.2 / model.5,
    matching the reference checkpoint layout.
    """

    def __init__(self, n_in, n_state, dilation=1, kernel_size=3, zero_out=True,
                 res_scale=1.0, dropout=0.1):
        super().__init__()
        pad = ((kernel_size - 1) * dilation) // 2
        self.model = nn.Sequential(
            nn.Dropout(dropout),
            nn.ReLU(),
            nn.Conv1d(n_in, n_state, kernel_size, 1, pad, dilation),
            nn.Dropout(dropout),
            nn.ReLU(),
            nn.Conv1d(n_state, n_in, 1),
        )
        if zero_out:
            _zero_(self.model[-1])
        self.res_scale = res_scale

    def forward(self, x):
        return x + self.res_scale * self.model(x)


class GatedHiFiBlock(nn.Module):
    """Parallel branches (1x1 expand + ResLayer), tanh*softmax gated fusion."""

    def __init__(self, n_in, n_depth, dilation_growth_rate=1, dilation_cycle=None,
                 kernel_size_growth_rate=2, kernel_size_cycle=None, zero_out=True,
                 res_scale=False, **_):
        super().__init__()
        self.res_scale = 1.0 if not res_scale else 1.0 / math.sqrt(n_depth)
        self.blocks = nn.ModuleList()
        for d in range(n_depth):
            self.blocks.append(nn.Sequential(
                nn.Conv1d(n_in, 2 * n_in, 1),
                ResLayer(2 * n_in, 2 * n_in,
                         dilation=dilation_growth_rate ** _cycle(d, dilation_cycle),
                         kernel_size=3 + kernel_size_growth_rate * _cycle(d, kernel_size_cycle),
                         zero_out=zero_out,
                         res_scale=1.0 if not res_scale else 1.0 / math.sqrt(n_depth)),
            ))
        self.gate = nn.Conv1d(n_in, n_in, 1)
        if zero_out:
            _zero_(self.gate)

    def forward(self, x, mask=None):
        m = 1.0 if mask is None else mask
        halves = [branch(x * m).chunk(2, dim=1) for branch in self.blocks]
        t = torch.stack([h[0] for h in halves], dim=1)
        s = torch.stack([h[1] for h in halves], dim=1)
        fused = (torch.tanh(t) * torch.softmax(s, dim=1)).sum(dim=1)
        return x + self.res_scale * self.gate(fused * m), m


class WaveNetBlock(nn.Module):
    """Gated tanh*sigmoid residual stack (reference resnet.py:123-181)."""

    def __init__(self, n_in, n_depth, m_conv=1.0, dilation_growth_rate=1,
                 dilation_cycle=None, zero_out=True, res_scale=False, **_):
        super().__init__()
        n_hid = int(m_conv * n_in)
        self.res_scale = 1.0 if not res_scale else 1.0 / math.sqrt(n_depth)
        self.conv_in = nn.Conv1d(n_in, n_hid, 1)
        self.conv_out = nn.Conv1d(n_hid, n_in, 1)
        self.convs = nn.ModuleList()
        self.gates = nn.ModuleList()
        for d in range(n_depth):
            dil = dilation_growth_rate ** _cycle(d, dilation_cycle)
            self.convs.append(nn.Conv1d(n_hid, 2 * n_hid, 3, padding=dil, dilation=dil))
            gate = nn.Conv1d(n_hid, n_hid, 1)
            if zero_out:
                _zero_(gate)
            self.gates.append(gate)

    def forward(self, x, mask=None):
        m = 1.0 if mask is None else mask
        x = self.conv_in(x * m)
        for conv, gate in zip(self.convs, self.gates):
            t, s = conv(x * m).chunk(2, dim=1)
            x = x + self.res_scale * gate(torch.tanh(t) * torch.sigmoid(s) * m)
        return self.conv_out(x * m), m


class ResNetBlock(nn.Module):
    """Serial dilated ResLayers (reference resnet.py:39-78)."""

    def __init__(self, n_in, n_depth, m_conv=1.0, dilation_growth_rate=1,
                 dilation_cycle=None, zero_out=True, res_scale=False,
                 reverse_dilation=False, **_):
        super().__init__()
        layers = [
            ResLayer(n_in, int(m_conv * n_in),
                     dilation=dilation_growth_rate ** _cycle(d, dilation_cycle),
                     zero_out=zero_out,
                     res_scale=1.0 if not res_scale else 1.0 / math.sqrt(n_depth))
            for d in range(n_depth)
        ]
        if reverse_dilation:
            layers = layers[::-1]
        self.model = nn.ModuleList(layers)

    def forward(self, x, mask=None):
        m = 1.0 if mask is None else mask
        for layer in self.model:
            x = layer(x * m)
        return x, m


class HiFiBlock(nn.Module):
    """Parallel multi-kernel ResLayers, mean-fused (reference resnet.py:81-120)."""

    def __init__(self, n_in, n_depth, m_conv=1.0, dilation_growth_rate=1,
                 dilation_cycle=None, kernel_size_growth_rate=2,
                 kernel_size_cycle=None, zero_out=True, res_scale=False, **_):
        super().__init__()
        self.blocks = nn.ModuleList([
            ResLayer(n_in, int(m_conv * n_in),
                     dilation=dilation_growth_rate ** _cycle(d, dilation_cycle),
                     kernel_size=3 + kernel_size_growth_rate * _cycle(d, kernel_size_cycle),
                     zero_out=zero_out,
                     res_scale=1.0 if not res_scale else 1.0 / math.sqrt(n_depth))
            for d in range(n_depth)
        ])

    def forward(self, x, mask=None):
        m = 1.0 if mask is None else mask
        outs = [block(x * m) for block in self.blocks]
        return sum(outs) / len(outs), m


_BLOCKS = {"base": ResNetBlock, "wavenet": WaveNetBlock, "hifi": HiFiBlock,
           "gated_hifi": GatedHiFiBlock}


class EncoderConvBlock(nn.Module):
    """[strided MaskedConv1d + block] * down_t + 3x1 out conv."""

    def __init__(self, input_emb_width, output_emb_width, down_t, stride_t,
                 block_type, width, depth, m_conv, **block_kwargs):
        super().__init__()
        Block = _BLOCKS[block_type]
        mods = []
        if down_t > 0:
            filt, pad = stride_t * 2, stride_t // 2
            for i in range(down_t):
                mods.append(MaskedConv1d(input_emb_width if i == 0 else width,
                                         width, filt, stride_t, pad))
                mods.append(Block(width, depth, m_conv=m_conv, **block_kwargs))
            mods.append(MaskedConv1d(width, output_emb_width, 3, 1, 1))
        self.blocks = nn.ModuleList(mods)

    def forward(self, x, mask):
        for mod in self.blocks:
            x, mask = mod(x, mask)
        return x, mask


class DecoderConvBlock(nn.Module):
    """3x1 in conv + [block + strided MaskedConvTranspose1d] * down_t."""

    def __init__(self, input_emb_width, output_emb_width, down_t, stride_t,
                 block_type, width, depth, m_conv, reverse_decoder_dilation=False,
                 **block_kwargs):
        super().__init__()
        Block = _BLOCKS[block_type]
        if block_type == "base":
            block_kwargs["reverse_dilation"] = reverse_decoder_dilation
        mods = []
        if down_t > 0:
            filt, pad = stride_t * 2, stride_t // 2
            mods.append(MaskedConv1d(output_emb_width, width, 3, 1, 1))
            for i in range(down_t):
                mods.append(Block(width, depth, m_conv=m_conv, **block_kwargs))
                mods.append(MaskedConvTranspose1d(
                    width, input_emb_width if i == down_t - 1 else width,
                    filt, stride_t, pad))
        self.blocks = nn.ModuleList(mods)

    def forward(self, x, mask):
        for mod in self.blocks:
            x, mask = mod(x, mask)
        return x, mask


class Encoder(nn.Module):
    def __init__(self, input_emb_width, output_emb_width, levels, downs_t,
                 strides_t, block_type, **block_kwargs):
        super().__init__()
        block_kwargs = {k: v for k, v in block_kwargs.items()
                        if k != "reverse_decoder_dilation"}
        self.level_blocks = nn.ModuleList([
            EncoderConvBlock(input_emb_width if level == 0 else output_emb_width,
                             output_emb_width, down_t, stride_t, block_type,
                             **block_kwargs)
            for level, (down_t, stride_t) in enumerate(zip(downs_t, strides_t))
        ])

    def forward(self, x, mask):
        for block in self.level_blocks:
            x, mask = block(x, mask)
        return x, mask


class Decoder(nn.Module):
    def __init__(self, input_emb_width, output_emb_width, levels, downs_t,
                 strides_t, block_type, **block_kwargs):
        super().__init__()
        self.level_blocks = nn.ModuleList([
            DecoderConvBlock(output_emb_width, output_emb_width, down_t, stride_t,
                             block_type, **block_kwargs)
            for down_t, stride_t in zip(downs_t, strides_t)
        ])
        self.out = nn.Conv1d(output_emb_width, input_emb_width, 1)

    def forward(self, xs, masks, all_levels=False):
        x, mask = xs[-1], masks[-1]
        for level in reversed(range(len(self.level_blocks))):
            x, mask = self.level_blocks[level](x, mask)
            if level != 0 and all_levels:
                x = x + xs[level - 1]
        return self.out(x * mask), mask


class BottleneckBlock(nn.Module):
    """EMA k-means codebook: quantize/dequantize plus the full TRAINING
    transition (EMA centroid update + dead-code revival + straight-through),
    written from the reference behavior spec (bottleneck.py:60-90,171-201).
    ``k`` is the registered buffer, matching the checkpoint layout
    (reference bottleneck.py:24)."""

    def __init__(self, k_bins, emb_width, mu, threshold):
        super().__init__()
        self.k_bins, self.emb_width, self.mu, self.threshold = k_bins, emb_width, mu, threshold
        self.register_buffer("k", torch.zeros(k_bins, emb_width))
        self.k_sum = None
        self.k_elem = None

    def restore_k(self, k):
        """Pre-initialize the codebook (reference restore_k semantics:
        k_sum starts as a copy of k, k_elem as ones)."""
        with torch.no_grad():
            self.k.copy_(k)
        self.k_sum = self.k.clone()
        self.k_elem = torch.ones(self.k_bins)

    def update_k(self, flat, codes):
        """EMA centroid transition over VALID rows only (the reference feeds
        x[indices] / x_l[indices], bottleneck.py:188)."""
        with torch.no_grad():
            onehot = F.one_hot(codes, self.k_bins).to(flat.dtype)  # [N, K]
            k_sum_batch = onehot.t() @ flat
            k_elem_batch = onehot.sum(0)
            # revival draw: random valid rows + 0.01/sqrt(C) noise (the
            # reference tiles + randperms; only consumed by dead codes)
            idx = torch.randint(0, flat.shape[0], (self.k_bins,))
            k_rand = flat[idx] + torch.randn(self.k_bins, flat.shape[1]) * (0.01 / math.sqrt(flat.shape[1]))

            old_k = self.k.clone()
            self.k_sum = self.mu * self.k_sum + (1.0 - self.mu) * k_sum_batch
            self.k_elem = self.mu * self.k_elem + (1.0 - self.mu) * k_elem_batch
            usage = (self.k_elem[:, None] >= self.threshold).to(flat.dtype)
            self.k.copy_(usage * (self.k_sum / self.k_elem[:, None]) + (1.0 - usage) * k_rand)

            k_prob = k_elem_batch / k_elem_batch.sum()
            entropy = -(k_prob * safe_log(k_prob, eps=1e-8)).sum()
            return {"entropy": entropy, "used_curr": (k_elem_batch >= self.threshold).sum(),
                    "usage": usage.sum(), "dk": (self.k - old_k).norm() / math.sqrt(old_k.numel())}

    def quantize(self, flat, mask=None):
        # squared-L2 distance matrix, argmin over codes (bottleneck.py:126-141)
        k_t = self.k.t()
        dist = (flat.pow(2).sum(-1, keepdim=True) - 2 * flat @ k_t
                + k_t.pow(2).sum(0, keepdim=True))
        min_d, codes = dist.min(dim=-1)
        if mask is None:
            fit = min_d.mean()
        else:
            fit = (min_d * mask).sum() / (mask.sum() * dist.shape[-1])
        return codes, fit

    def encode(self, x, mask):
        n, _, t = x.shape
        flat = x.permute(0, 2, 1).reshape(-1, self.emb_width)
        codes, _ = self.quantize(flat, mask.permute(0, 2, 1).reshape(-1))
        return codes.view(n, t)

    def decode(self, codes):
        return F.embedding(codes, self.k).permute(0, 2, 1).contiguous()

    def forward(self, x, mask, update_k=False):
        n, _, t = x.shape
        flat = x.permute(0, 2, 1).reshape(-1, self.emb_width)
        flat_mask = mask.permute(0, 2, 1).reshape(-1)
        with torch.no_grad():
            codes, fit = self.quantize(flat, flat_mask)
            quant = F.embedding(codes, self.k)
        valid = flat_mask != 0
        metrics = {"fit": fit}
        if update_k:
            # reference order: update_k BEFORE the loss/passthrough
            # (bottleneck.py:186-196), using the pre-update codes
            metrics.update(self.update_k(flat[valid].detach(), codes[valid]))
        commit = (quant[valid].detach() - flat[valid]).norm() ** 2 / (flat_mask.sum() * flat.shape[1])
        quant = flat + (quant - flat).detach()
        x_d = quant.view(n, t, -1).permute(0, 2, 1).contiguous()
        return codes.view(n, t), x_d * mask, commit, metrics


class STFT(nn.Module):
    """Magnitude STFT via windowed DFT-basis conv (transforms.py:71-123)."""

    def __init__(self, n_fft=1024, hop_length=256, win_length=None, window="hann"):
        super().__init__()
        from scipy.signal import get_window

        self.n_fft, self.hop_length = n_fft, hop_length
        self.win_length = win_length or n_fft
        self.pad_amount = (n_fft - hop_length) // 2
        basis = np.fft.fft(np.eye(n_fft))
        cutoff = n_fft // 2 + 1
        basis = np.vstack([np.real(basis[:cutoff]), np.imag(basis[:cutoff])])
        win = get_window(window, self.win_length, fftbins=True)
        lpad = (n_fft - self.win_length) // 2
        win = np.pad(win, (lpad, n_fft - self.win_length - lpad))
        self.register_buffer("forward_basis",
                             torch.from_numpy((basis * win)[:, None, :]).float())

    def forward(self, audio):
        x = audio.view(audio.shape[0], 1, -1)
        x = F.pad(x, (self.pad_amount, self.pad_amount), mode="reflect")
        spec = F.conv1d(x, self.forward_basis, stride=self.hop_length)
        cutoff = self.n_fft // 2 + 1
        return torch.sqrt(spec[:, :cutoff] ** 2 + spec[:, cutoff:] ** 2)


def safe_log(x, eps=1e-5):
    return torch.log(torch.clamp(x, min=eps))


class MultiResolutionSpectralLoss(nn.Module):
    """Masked multi-res spectral MSE->sqrt loss (losses.py:11-55)."""

    def __init__(self, n_ffts, hop_lengths, win_lengths=None, window="hann", log=False):
        super().__init__()
        win_lengths = win_lengths or n_ffts
        self.stfts = nn.ModuleList([
            STFT(n, h, w, window) for n, h, w in zip(n_ffts, hop_lengths, win_lengths)])
        self.log = log

    @staticmethod
    def downsample_mask(mask, stft):
        m = F.pad(mask, (stft.pad_amount, 0), value=1)
        m = F.pad(m, (0, stft.pad_amount), value=0)
        return m[:, :, stft.n_fft // 2:-stft.n_fft // 2 + 1:stft.hop_length]

    def forward(self, y, yh, mask):
        loss = 0.0
        for stft in self.stfts:
            sy, syh = stft(y), stft(yh)
            m = self.downsample_mask(mask, stft)
            loss = loss + F.mse_loss(sy * m, syh * m, reduction="none").sum(-1).sum(-1).sqrt().mean(0)
            if self.log:
                loss = loss + F.mse_loss(safe_log(sy) * m, safe_log(syh) * m,
                                         reduction="none").sum(-1).sum(-1).sqrt().mean(0)
        return loss / len(self.stfts)


class MultiNormReconstructionLoss(nn.Module):
    """Weighted L1 + L2 + top-k Linf (losses.py:58-80)."""

    def __init__(self, l1=0.0, l2=1.0, linf=0.02, linf_topk=2048):
        super().__init__()
        self.l1, self.l2, self.linf, self.linf_topk = l1, l2, linf, linf_topk

    def forward(self, y, yh, mask):
        yf = (y * mask).reshape(y.shape[0], -1)
        yhf = (yh * mask).reshape(yh.shape[0], -1)
        return (self.l1 * F.l1_loss(yf, yhf).mean(0).sum()
                + self.l2 * F.mse_loss(yf, yhf).mean(0).sum()
                + self.linf * torch.topk((yf - yhf) ** 2, self.linf_topk, -1)[0].mean(0).sum())


class VQVAE(nn.Module):
    """Effective reference VQ-VAE (after the last-level HACK, vqvae.py:65-71):
    ONE encoder/decoder over the full down stack, width/depth scaled by
    multipliers[-1], module names encoders.0 / decoders.0 / bottleneck."""

    def __init__(self, cfg: dict):
        super().__init__()
        m = cfg["model"]
        mult = (m.get("multipliers") or [1] * m["levels"])[-1]
        common = dict(
            input_emb_width=1,
            output_emb_width=m["emb_width"],
            levels=m["levels"],
            downs_t=m["downs_t"],
            strides_t=m["strides_t"],
            block_type=m["block_type"],
            width=m["width"] * mult,
            depth=m["depth"] * mult,
            m_conv=m["m_conv"],
            dilation_growth_rate=m["dilation_growth_rate"],
            dilation_cycle=m["dilation_cycle"],
            kernel_size_growth_rate=m["kernel_size_growth_rate"],
            kernel_size_cycle=m["kernel_size_cycle"],
            zero_out=m["zero_out"],
            reverse_decoder_dilation=m["reverse_decoder_dilation"],
        )
        self.encoders = nn.ModuleList([Encoder(**common)])
        self.decoders = nn.ModuleList([Decoder(**common)])

        class _LevelBlocks(nn.Module):
            def __init__(self, block):
                super().__init__()
                self.level_blocks = nn.ModuleList([block])

        self.bottleneck = _LevelBlocks(BottleneckBlock(
            m["l_bins"], m["emb_width"], m["mu"], m["revival_threshold"]))
        loss = m["loss"]
        self.multi_stft_loss = MultiResolutionSpectralLoss(
            loss["n_ffts"], loss["hop_lengths"], loss.get("win_lengths"),
            loss.get("window", "hann"), loss["log"])
        self.multi_recon_loss = MultiNormReconstructionLoss(
            loss["l1"], loss["l2"], loss["linf"], loss["linf_topk"])
        self.commit = loss["commit"]
        self.multispectral = loss["multispectral"]

    def forward(self, x, x_lengths, update_k=False):
        """x: [B, 1, T]. update_k=True runs the training transition."""
        t = x.shape[-1]
        mask = (torch.arange(t)[None, :] < x_lengths[:, None]).to(x.dtype)[:, None, :]
        h, h_mask = self.encoders[0](x, mask)
        bn = self.bottleneck.level_blocks[0]
        codes, x_d, commit, metrics = bn(h, h_mask, update_k=update_k)
        y, _ = self.decoders[0]([x_d], [h_mask])
        loss_recon = self.multi_recon_loss(x, y, mask)
        loss_stft = self.multi_stft_loss(x, y, mask)
        loss = loss_recon + self.multispectral * loss_stft + self.commit * commit
        return {"loss": loss, "loss_recon": loss_recon, "loss_stft": loss_stft,
                "loss_commit": commit, "codes": codes, "yh": y.squeeze(1), **metrics}
