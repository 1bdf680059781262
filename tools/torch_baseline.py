"""PyTorch-CPU baseline for the VQ-VAE training throughput benchmark.

The reference publishes no numbers (BASELINE.md), so the baseline is
*measured*: a PyTorch implementation of the same effective VQ-VAE
architecture (reference-scale config: emb 128, width 64/depth 4 effective —
the reference keeps only the LAST level whose multiplier is 1
(vqvae.py:65-71); gated-hifi blocks, 128x compression, EMA k-means codebook,
multi-res STFT + multi-norm losses) running full train steps
(forward + backward + Adam) on CPU — the hardware the thesis code actually
ran on when no GPU was present (reference train.py:553-556).

Run once; the result is cached into tools/baseline_cpu.json, which bench.py
reads to compute vs_baseline.

Usage: python -m tools.torch_baseline [--steps 3] [--batch 8] [--seconds 3.0]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

HOP = 256


class GatedResBranch(nn.Module):
    """1x1 expand -> (drop/relu/dilated conv/drop/relu/1x1-zero) residual."""

    def __init__(self, ch, dilation, kernel):
        super().__init__()
        self.expand = nn.Conv1d(ch, 2 * ch, 1)
        pad = ((kernel - 1) * dilation) // 2
        self.body = nn.Sequential(
            nn.Dropout(0.1), nn.ReLU(),
            nn.Conv1d(2 * ch, 2 * ch, kernel, padding=pad, dilation=dilation),
            nn.Dropout(0.1), nn.ReLU(),
            nn.Conv1d(2 * ch, 2 * ch, 1),
        )
        nn.init.zeros_(self.body[-1].weight)
        nn.init.zeros_(self.body[-1].bias)

    def forward(self, x):
        h = self.expand(x)
        return h + self.body(h)


class GatedHiFi(nn.Module):
    def __init__(self, ch, depth):
        super().__init__()
        self.branches = nn.ModuleList(
            [GatedResBranch(ch, 3 ** d, 3 + 2 * d) for d in range(depth)])
        self.gate = nn.Conv1d(ch, ch, 1)
        nn.init.zeros_(self.gate.weight)
        nn.init.zeros_(self.gate.bias)

    def forward(self, x):
        ts, ss = [], []
        for branch in self.branches:
            t, s = branch(x).chunk(2, dim=1)
            ts.append(t)
            ss.append(s)
        t = torch.stack(ts, 1)
        s = torch.stack(ss, 1)
        z = (torch.tanh(t) * torch.softmax(s, dim=1)).sum(1)
        return x + self.gate(z)


class CodecEncoder(nn.Module):
    def __init__(self, emb=128, width=64, depth=4, downs=(3, 2, 2)):
        super().__init__()
        stages = []
        ch_in = 1
        for level, down in enumerate(downs):
            for i in range(down):
                stages += [nn.Conv1d(ch_in if (level == 0 and i == 0) else width,
                                     width, 4, 2, 1), GatedHiFi(width, depth)]
            stages += [nn.Conv1d(width, emb, 3, 1, 1)]
            ch_in = emb
            if level < len(downs) - 1:
                stages += [nn.Conv1d(emb, width, 1)]
        self.net = nn.Sequential(*stages)

    def forward(self, x):
        return self.net(x)


class CodecDecoder(nn.Module):
    def __init__(self, emb=128, width=64, depth=4, downs=(3, 2, 2)):
        super().__init__()
        stages = []
        for level, down in enumerate(reversed(downs)):
            stages += [nn.Conv1d(emb if level == 0 else width, width, 3, 1, 1)]
            for i in range(down):
                stages += [GatedHiFi(width, depth), nn.ConvTranspose1d(width, width, 4, 2, 1)]
        stages += [nn.Conv1d(width, 1, 1)]
        self.net = nn.Sequential(*stages)

    def forward(self, x):
        return self.net(x)


class BaselineVQVAE(nn.Module):
    def __init__(self, emb=128, k_bins=512):
        super().__init__()
        self.encoder = CodecEncoder(emb)
        self.decoder = CodecDecoder(emb)
        self.register_buffer("codebook", torch.randn(k_bins, emb))
        self.stft_windows = [2048, 1024, 512]
        self.stft_hops = [240, 120, 50]

    def forward(self, x):
        h = self.encoder(x)  # [B, C, T']
        flat = h.permute(0, 2, 1).reshape(-1, h.shape[1])
        with torch.no_grad():
            d = (flat.pow(2).sum(-1, keepdim=True)
                 - 2 * flat @ self.codebook.T + self.codebook.pow(2).sum(-1))
            codes = d.argmin(-1)
        quant = self.codebook[codes].reshape(h.shape[0], h.shape[2], -1).permute(0, 2, 1)
        commit = F.mse_loss(h, quant.detach())
        hq = h + (quant - h).detach()
        y = self.decoder(hq)
        recon = F.mse_loss(y, x) + 0.02 * (y - x).pow(2).flatten(1).topk(2048, -1)[0].mean()
        spectral = 0.0
        for n_fft, hop in zip(self.stft_windows, self.stft_hops):
            win = torch.hann_window(n_fft)
            sy = torch.stft(x.squeeze(1), n_fft, hop, window=win, return_complex=True).abs()
            syh = torch.stft(y.squeeze(1), n_fft, hop, window=win, return_complex=True).abs()
            spectral = spectral + (sy - syh).pow(2).sum((-1, -2)).sqrt().mean()
        return recon + spectral / 3 + 0.05 * commit


def measure(batch: int, seconds: float, steps: int) -> dict:
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    t_samples = int(seconds * 22050) // 512 * 512
    model = BaselineVQVAE()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, betas=(0.9, 0.98), eps=1e-9)
    x = torch.from_numpy(np.random.RandomState(0)
                         .uniform(-0.5, 0.5, (batch, 1, t_samples)).astype(np.float32))

    # one warmup step
    loss = model(x)
    loss.backward()
    opt.step()
    opt.zero_grad()

    start = time.perf_counter()
    for _ in range(steps):
        loss = model(x)
        loss.backward()
        opt.step()
        opt.zero_grad()
    elapsed = time.perf_counter() - start

    mel_frames = batch * t_samples / HOP * steps
    return {
        "metric": "vqvae_train_mel_frames_per_sec",
        "value": mel_frames / elapsed,
        "unit": "mel-frames/s",
        "hardware": "cpu",
        "threads": torch.get_num_threads(),
        "batch": batch,
        "clip_seconds": seconds,
        "steps": steps,
        "elapsed_s": elapsed,
        "params": sum(p.numel() for p in model.parameters()),
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=3.0)
    args = parser.parse_args()
    result = measure(args.batch, args.seconds, args.steps)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline_cpu.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
