"""Reference-semantics PyTorch Glow-TTS modules — cross-framework parity oracle.

Test-only. Models the observable behavior of the reference Glow-TTS stack
(/root/reference/models/glow_tts/{modules,submodules}.py) with nn.Module
attribute names matching the reference, so ``state_dict()`` keys are
byte-identical to a real reference checkpoint and flow straight through
tools/import_torch_checkpoint.py. Written from the layer specs (weight-norm
convs, ActNorm, invertible grouped 1x1 conv, affine coupling, windowed
relative attention), not transcribed.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class LayerNorm(nn.Module):
    """Channel-first LayerNorm, eps=1e-4 (reference submodules.py:98-117)."""

    def __init__(self, channels, eps=1e-4):
        super().__init__()
        self.eps = eps
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):  # x: [B, C, T]
        mean = x.mean(1, keepdim=True)
        var = ((x - mean) ** 2).mean(1, keepdim=True)
        xhat = (x - mean) * torch.rsqrt(var + self.eps)
        shape = [1, -1] + [1] * (x.dim() - 2)
        return xhat * self.gamma.view(*shape) + self.beta.view(*shape)


class ConvReluNorm(nn.Module):
    """Prenet: n x (conv->LN->relu->drop) + zero-init residual projection."""

    def __init__(self, in_channels, hidden_channels, out_channels, kernel_size,
                 n_layers, p_dropout):
        super().__init__()
        self.n_layers = n_layers
        self.conv_layers = nn.ModuleList()
        self.norm_layers = nn.ModuleList()
        ch = in_channels
        for _ in range(n_layers):
            self.conv_layers.append(nn.Conv1d(ch, hidden_channels, kernel_size,
                                              padding=kernel_size // 2))
            self.norm_layers.append(LayerNorm(hidden_channels))
            ch = hidden_channels
        self.relu_drop = nn.Sequential(nn.ReLU(), nn.Dropout(p_dropout))
        self.proj = nn.Conv1d(hidden_channels, out_channels, 1)
        nn.init.zeros_(self.proj.weight)
        nn.init.zeros_(self.proj.bias)

    def forward(self, x, x_mask):
        res = x
        for conv, norm in zip(self.conv_layers, self.norm_layers):
            x = self.relu_drop(norm(conv(x * x_mask)))
        return (res + self.proj(x)) * x_mask


class WN(nn.Module):
    """Weight-normalized WaveNet conditioner (reference submodules.py:167-232)."""

    def __init__(self, hidden_channels, kernel_size, dilation_rate, n_layers,
                 p_dropout=0.0, gin_channels=0):
        super().__init__()
        self.hidden_channels = hidden_channels
        self.n_layers = n_layers
        self.in_layers = nn.ModuleList()
        self.res_skip_layers = nn.ModuleList()
        self.drop = nn.Dropout(p_dropout)
        if gin_channels:
            self.cond_layer = nn.utils.weight_norm(
                nn.Conv1d(gin_channels, 2 * hidden_channels * n_layers, 1))
        for i in range(n_layers):
            dil = dilation_rate ** i
            pad = (kernel_size * dil - dil) // 2
            self.in_layers.append(nn.utils.weight_norm(
                nn.Conv1d(hidden_channels, 2 * hidden_channels, kernel_size,
                          dilation=dil, padding=pad)))
            out_ch = 2 * hidden_channels if i < n_layers - 1 else hidden_channels
            self.res_skip_layers.append(nn.utils.weight_norm(
                nn.Conv1d(hidden_channels, out_ch, 1)))

    def forward(self, x, x_mask=None, g=None):
        h = self.hidden_channels
        out = torch.zeros_like(x)
        if g is not None:
            g = self.cond_layer(g)
        for i, (inl, rsl) in enumerate(zip(self.in_layers, self.res_skip_layers)):
            z = self.drop(inl(x))
            if g is not None:
                z = z + g[:, i * 2 * h:(i + 1) * 2 * h]
            acts = torch.tanh(z[:, :h]) * torch.sigmoid(z[:, h:])
            rs = rsl(acts)
            if i < self.n_layers - 1:
                x = (x + rs[:, :h]) * x_mask
                out = out + rs[:, h:]
            else:
                out = out + rs
        return out * x_mask


class ActNorm(nn.Module):
    def __init__(self, channels, ddi=False, **_):
        super().__init__()
        self.initialized = not ddi
        self.logs = nn.Parameter(torch.zeros(1, channels, 1))
        self.bias = nn.Parameter(torch.zeros(1, channels, 1))

    def forward(self, x, x_mask=None, reverse=False, **_):
        if x_mask is None:
            x_mask = torch.ones(x.size(0), 1, x.size(2), dtype=x.dtype)
        x_len = x_mask.sum([1, 2])
        if not self.initialized:
            with torch.no_grad():
                denom = x_mask.sum([0, 2])
                m = (x * x_mask).sum([0, 2]) / denom
                v = (x * x * x_mask).sum([0, 2]) / denom - m * m
                logs = 0.5 * torch.log(v.clamp_min(1e-6))
                self.bias.data.copy_((-m * torch.exp(-logs)).view(self.bias.shape))
                self.logs.data.copy_((-logs).view(self.logs.shape))
            self.initialized = True
        if reverse:
            return (x - self.bias) * torch.exp(-self.logs) * x_mask, None
        z = (self.bias + torch.exp(self.logs) * x) * x_mask
        return z, self.logs.sum() * x_len


class InvConvNear(nn.Module):
    def __init__(self, channels, n_split=4, no_jacobian=False, **_):
        super().__init__()
        self.n_split = n_split
        self.no_jacobian = no_jacobian
        w = torch.linalg.qr(torch.randn(n_split, n_split))[0]
        if torch.det(w) < 0:
            w[:, 0] = -w[:, 0]
        self.weight = nn.Parameter(w)

    def forward(self, x, x_mask=None, reverse=False, **_):
        b, c, t = x.shape
        s = self.n_split
        if x_mask is None:
            x_mask, x_len = 1, torch.full((b,), t, dtype=x.dtype)
        else:
            x_len = x_mask.sum([1, 2])
        xg = x.view(b, 2, c // s, s // 2, t).permute(0, 1, 3, 2, 4).reshape(b, s, c // s, t)
        if reverse:
            w, logdet = torch.inverse(self.weight.float()).to(x.dtype), None
        else:
            w = self.weight
            logdet = 0 if self.no_jacobian else torch.logdet(self.weight) * (c / s) * x_len
        z = F.conv2d(xg, w.view(s, s, 1, 1))
        z = z.view(b, 2, s // 2, c // s, t).permute(0, 1, 3, 2, 4).reshape(b, c, t)
        return z * x_mask, logdet


class CouplingBlock(nn.Module):
    def __init__(self, in_channels, hidden_channels, kernel_size, dilation_rate,
                 n_layers, gin_channels=0, p_dropout=0.0, sigmoid_scale=False):
        super().__init__()
        self.in_channels = in_channels
        self.sigmoid_scale = sigmoid_scale
        self.start = nn.utils.weight_norm(nn.Conv1d(in_channels // 2, hidden_channels, 1))
        self.end = nn.Conv1d(hidden_channels, in_channels, 1)
        nn.init.zeros_(self.end.weight)
        nn.init.zeros_(self.end.bias)
        self.wn = WN(hidden_channels, kernel_size, dilation_rate, n_layers,
                     p_dropout, gin_channels)

    def forward(self, x, x_mask=None, reverse=False, g=None, **_):
        if x_mask is None:
            x_mask = 1
        half = self.in_channels // 2
        x0, x1 = x[:, :half], x[:, half:]
        out = self.end(self.wn(self.start(x0) * x_mask, x_mask, g))
        m, logs = out[:, :half], out[:, half:]
        if self.sigmoid_scale:
            logs = torch.log(1e-6 + torch.sigmoid(logs + 2))
        if reverse:
            z1, logdet = (x1 - m) * torch.exp(-logs) * x_mask, None
        else:
            z1 = (m + torch.exp(logs) * x1) * x_mask
            logdet = (logs * x_mask).sum([1, 2])
        return torch.cat([x0, z1], 1), logdet


class AttentionBlock(nn.Module):
    """Multi-head attention with windowed relative-position embeddings."""

    def __init__(self, channels, out_channels, n_heads, window_size=None,
                 heads_share=True, p_dropout=0.0, block_length=None,
                 proximal_bias=False):
        super().__init__()
        self.n_heads = n_heads
        self.k_channels = channels // n_heads
        self.window_size = window_size
        self.block_length = block_length
        self.proximal_bias = proximal_bias
        self.conv_q = nn.Conv1d(channels, channels, 1)
        self.conv_k = nn.Conv1d(channels, channels, 1)
        self.conv_v = nn.Conv1d(channels, channels, 1)
        self.conv_o = nn.Conv1d(channels, out_channels, 1)
        self.drop = nn.Dropout(p_dropout)
        if window_size is not None:
            n_rel = 1 if heads_share else n_heads
            std = self.k_channels ** -0.5
            self.emb_rel_k = nn.Parameter(torch.randn(n_rel, 2 * window_size + 1,
                                                      self.k_channels) * std)
            self.emb_rel_v = nn.Parameter(torch.randn(n_rel, 2 * window_size + 1,
                                                      self.k_channels) * std)

    def _rel_table(self, emb, length):
        pad = max(length - (self.window_size + 1), 0)
        start = max((self.window_size + 1) - length, 0)
        if pad > 0:
            emb = F.pad(emb, (0, 0, pad, pad))
        return emb[:, start:start + 2 * length - 1]

    @staticmethod
    def _rel_to_abs(x):
        b, h, l, _ = x.shape
        x = F.pad(x, (0, 1)).view(b, h, l * 2 * l)
        x = F.pad(x, (0, l - 1)).view(b, h, l + 1, 2 * l - 1)
        return x[:, :, :l, l - 1:]

    @staticmethod
    def _abs_to_rel(x):
        b, h, l, _ = x.shape
        x = F.pad(x, (0, l - 1)).view(b, h, l * l + l * (l - 1))
        x = F.pad(x, (l, 0)).view(b, h, l, 2 * l)
        return x[:, :, :, 1:]

    def forward(self, x, c, attn_mask=None):
        q, k, v = self.conv_q(x), self.conv_k(c), self.conv_v(c)
        b, d, t = q.shape
        h, dk = self.n_heads, self.k_channels
        qh = q.view(b, h, dk, t).transpose(2, 3)
        kh = k.view(b, h, dk, t).transpose(2, 3)
        vh = v.view(b, h, dk, t).transpose(2, 3)
        scores = qh @ kh.transpose(-2, -1) / math.sqrt(dk)
        if self.window_size is not None:
            table = self._rel_table(self.emb_rel_k, t)
            rel = qh @ table.unsqueeze(0).transpose(-2, -1)
            scores = scores + self._rel_to_abs(rel) / math.sqrt(dk)
        if self.proximal_bias:
            r = torch.arange(t, dtype=torch.float32)
            scores = scores - torch.log1p((r[None, :] - r[:, None]).abs())[None, None]
        if attn_mask is not None:
            scores = scores.masked_fill(attn_mask == 0, -1e4)
            if self.block_length is not None:
                band = torch.ones_like(scores).triu(-self.block_length).tril(self.block_length)
                scores = scores * band + -1e4 * (1 - band)
        p = self.drop(F.softmax(scores, dim=-1))
        out = p @ vh
        if self.window_size is not None:
            out = out + self._abs_to_rel(p) @ self._rel_table(self.emb_rel_v, t).unsqueeze(0)
        return self.conv_o(out.transpose(2, 3).reshape(b, d, t))


class FeedForwardNetwork(nn.Module):
    def __init__(self, in_channels, out_channels, filter_channels, kernel_size,
                 p_dropout=0.0, activation=None):
        super().__init__()
        self.activation = activation
        self.conv_1 = nn.Conv1d(in_channels, filter_channels, kernel_size,
                                padding=kernel_size // 2)
        self.conv_2 = nn.Conv1d(filter_channels, out_channels, kernel_size,
                                padding=kernel_size // 2)
        self.drop = nn.Dropout(p_dropout)

    def forward(self, x, x_mask):
        x = self.conv_1(x * x_mask)
        x = x * torch.sigmoid(1.702 * x) if self.activation == "gelu" else torch.relu(x)
        return self.conv_2(self.drop(x) * x_mask) * x_mask


class DurationPredictor(nn.Module):
    def __init__(self, in_channels, filter_channels, kernel_size, p_dropout):
        super().__init__()
        self.drop = nn.Dropout(p_dropout)
        self.conv_1 = nn.Conv1d(in_channels, filter_channels, kernel_size,
                                padding=kernel_size // 2)
        self.norm_1 = LayerNorm(filter_channels)
        self.conv_2 = nn.Conv1d(filter_channels, filter_channels, kernel_size,
                                padding=kernel_size // 2)
        self.norm_2 = LayerNorm(filter_channels)
        self.proj = nn.Conv1d(filter_channels, 1, 1)

    def forward(self, spect, mask):
        x = self.drop(self.norm_1(torch.relu(self.conv_1(spect * mask))))
        x = self.drop(self.norm_2(torch.relu(self.conv_2(x * mask))))
        return (self.proj(x * mask) * mask).squeeze(1)


class TextEncoder(nn.Module):
    """Reference modules.py:9-131 (attribute names = checkpoint contract)."""

    def __init__(self, n_vocab, out_channels, hidden_channels, filter_channels,
                 filter_channels_dp, n_heads, n_layers, kernel_size, p_dropout,
                 window_size, mean_only=False, prenet=False, gin_channels=0):
        super().__init__()
        self.n_layers = n_layers
        self.hidden_channels = hidden_channels
        self.prenet = prenet
        self.mean_only = mean_only
        self.emb = nn.Embedding(n_vocab, hidden_channels)
        nn.init.normal_(self.emb.weight, 0.0, hidden_channels ** -0.5)
        if prenet:
            self.pre = ConvReluNorm(hidden_channels, hidden_channels, hidden_channels,
                                    kernel_size=5, n_layers=3, p_dropout=0.1)
        self.drop = nn.Dropout(p_dropout)
        self.attn_layers = nn.ModuleList()
        self.norm_layers_1 = nn.ModuleList()
        self.ffn_layers = nn.ModuleList()
        self.norm_layers_2 = nn.ModuleList()
        for _ in range(n_layers):
            self.attn_layers.append(AttentionBlock(
                hidden_channels, hidden_channels, n_heads, window_size=window_size,
                p_dropout=p_dropout))
            self.norm_layers_1.append(LayerNorm(hidden_channels))
            self.ffn_layers.append(FeedForwardNetwork(
                hidden_channels, hidden_channels, filter_channels, kernel_size,
                p_dropout=p_dropout))
            self.norm_layers_2.append(LayerNorm(hidden_channels))
        self.proj_m = nn.Conv1d(hidden_channels, out_channels, 1)
        if not mean_only:
            self.proj_s = nn.Conv1d(hidden_channels, out_channels, 1)
        self.proj_w = DurationPredictor(hidden_channels + gin_channels,
                                        filter_channels_dp, kernel_size, p_dropout)

    def forward(self, text, text_lengths, speaker_embeddings=None):
        x = (self.emb(text) * math.sqrt(self.hidden_channels)).transpose(1, -1)
        x_mask = (torch.arange(x.size(2))[None, :]
                  < text_lengths[:, None]).to(x.dtype)[:, None, :]
        if self.prenet:
            x = self.pre(x, x_mask)
        attn_mask = x_mask.unsqueeze(2) * x_mask.unsqueeze(-1)
        for i in range(self.n_layers):
            x = x * x_mask
            y = self.drop(self.attn_layers[i](x, x, attn_mask))
            x = self.norm_layers_1[i](x + y)
            y = self.drop(self.ffn_layers[i](x, x_mask))
            x = self.norm_layers_2[i](x + y)
        x = x * x_mask
        x_dp = torch.detach(x)
        if speaker_embeddings is not None:
            x_dp = torch.cat([x_dp, speaker_embeddings.expand(-1, -1, x.size(-1))], 1)
        x_m = self.proj_m(x) * x_mask
        x_logs = torch.zeros_like(x_m) if self.mean_only else self.proj_s(x) * x_mask
        logw = self.proj_w(x_dp, x_mask)
        return x_m, x_logs, logw, x_mask


class FlowSpecDecoder(nn.Module):
    """Reference modules.py:134-236."""

    def __init__(self, in_channels, hidden_channels, kernel_size, dilation_rate,
                 n_blocks, n_layers, p_dropout=0.0, n_split=4, n_sqz=2,
                 sigmoid_scale=False, gin_channels=0, ddi=False):
        super().__init__()
        self.n_sqz = n_sqz
        self.flows = nn.ModuleList()
        for _ in range(n_blocks):
            self.flows.append(ActNorm(in_channels * n_sqz, ddi=ddi))
            self.flows.append(InvConvNear(in_channels * n_sqz, n_split=n_split))
            self.flows.append(CouplingBlock(
                in_channels * n_sqz, hidden_channels, kernel_size=kernel_size,
                dilation_rate=dilation_rate, n_layers=n_layers, p_dropout=p_dropout,
                sigmoid_scale=sigmoid_scale, gin_channels=gin_channels))

    @staticmethod
    def squeeze(x, x_mask, n):
        b, c, t = x.shape
        t = (t // n) * n
        x = x[:, :, :t].view(b, c, t // n, n).permute(0, 3, 1, 2).reshape(b, c * n, t // n)
        x_mask = x_mask[:, :, n - 1::n]
        return x * x_mask, x_mask

    @staticmethod
    def unsqueeze(x, x_mask, n):
        b, c, t = x.shape
        x = x.view(b, n, c // n, t).permute(0, 2, 3, 1).reshape(b, c // n, t * n)
        x_mask = x_mask.unsqueeze(-1).repeat(1, 1, 1, n).view(b, 1, t * n)
        return x * x_mask, x_mask

    def forward(self, spect, spect_mask, speaker_embeddings=None, reverse=False):
        x, x_mask = spect, spect_mask
        if self.n_sqz > 1:
            x, x_mask = self.squeeze(x, x_mask, self.n_sqz)
        logdet_tot = None if reverse else 0
        for f in (reversed(self.flows) if reverse else self.flows):
            x, logdet = f(x, x_mask, g=speaker_embeddings, reverse=reverse)
            if not reverse:
                logdet_tot = logdet_tot + logdet
        if self.n_sqz > 1:
            x, x_mask = self.unsqueeze(x, x_mask, self.n_sqz)
        return x, logdet_tot
