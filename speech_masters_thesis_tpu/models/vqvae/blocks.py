"""Residual conv block zoo for the VQ-VAE codec (flax, NTC layout).

TPU-native rebuild of reference models/vqvae/resnet.py:16-241. All tensors
are [batch, time, channels] so channels ride the TPU lanes; convs are
``nn.Conv`` over the time axis with torch-compatible explicit padding.
Zero-initialized output projections (``zero_out``) are functional behavior
(residual branches start as identity) and are reproduced.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def get_mod_cycle(depth: int, cycle: Optional[int]) -> int:
    """Depth -> exponent/cycle index (reference resnet.py:9-13)."""
    return depth if cycle is None else depth % cycle


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
        padding = ((self.kernel_size - 1) * self.dilation) // 2
        h = nn.Dropout(self.dropout, deterministic=not train)(x)
        h = nn.relu(h)
        h = nn.Conv(self.n_state, (self.kernel_size,), padding=[(padding, padding)],
                    kernel_dilation=(self.dilation,))(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(h)
        out_init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()
        h = nn.Conv(self.n_in, (1,), kernel_init=out_init)(h)
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = True):
        m = 1.0 if mask is None else mask
        n_hid = int(self.m_conv * self.n_in)
        scale = 1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth)
        gate_init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()

        x = nn.Conv(n_hid, (1,), name="conv_in")(x * m)
        for depth in range(self.n_depth):
            d = self.dilation_growth_rate ** get_mod_cycle(depth, self.dilation_cycle)
            z = nn.Conv(2 * n_hid, (3,), padding=[(d, d)], kernel_dilation=(d,),
                        name=f"conv_{depth}")(x * m)
            t, s = jnp.split(z, 2, axis=-1)
            z = jnp.tanh(t) * nn.sigmoid(s)
            z = nn.Conv(n_hid, (1,), kernel_init=gate_init, name=f"gate_{depth}")(z * m)
            x = x + scale * z
        x = nn.Conv(self.n_in, (1,), name="conv_out")(x * m)
        return x, m


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

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = True):
        m = 1.0 if mask is None else mask
        scale = 1.0 if not self.res_scale else 1.0 / math.sqrt(self.n_depth)

        ts, ss = [], []
        for depth in range(self.n_depth):
            z = nn.Conv(2 * self.n_in, (1,), name=f"branch_in_{depth}")(x * m)
            z = ResLayer(
                2 * self.n_in,
                2 * self.n_in,
                dilation=self.dilation_growth_rate ** get_mod_cycle(depth, self.dilation_cycle),
                kernel_size=3 + self.kernel_size_growth_rate * get_mod_cycle(depth, self.kernel_size_cycle),
                zero_out=self.zero_out,
                res_scale=scale,
                name=f"branch_res_{depth}",
            )(z, train=train)
            t, s = jnp.split(z, 2, axis=-1)
            ts.append(t)
            ss.append(s)

        # gate across the branch axis: tanh(t) * softmax(s), summed over branches
        t = jnp.stack(ts, axis=1)  # [B, depth, T, C]
        s = jnp.stack(ss, axis=1)
        z = jnp.sum(jnp.tanh(t) * nn.softmax(s, axis=1), axis=1)
        gate_init = nn.initializers.zeros if self.zero_out else nn.initializers.lecun_normal()
        z = nn.Conv(self.n_in, (1,), kernel_init=gate_init, name="gate")(z * m)
        return x + scale * z, m


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
