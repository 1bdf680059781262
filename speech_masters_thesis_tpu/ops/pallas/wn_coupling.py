"""Fused Glow-TTS CouplingBlock conditioner as Pallas TPU kernels.

Why this kernel exists: the Glow-TTS train step is dominated by the 12
CouplingBlocks' WaveNet conditioners (reference
models/glow_tts/submodules.py:167-400; flax path
models/glow_tts/flows.py:150-234). A device trace of the XLA step shows
~52% of device time in WN convolution fusions plus most of the gated
tanh*sigmoid loop fusions, spread over ~9,200 tiny HLO ops per step whose
scheduling gaps leave the chip idle ~30% of the wall step (BASELINE.md).

This kernel computes the ENTIRE conditioner — start 1x1, n_layers x
(dilated conv -> dropout -> gated tanh*sigmoid -> res/skip 1x1), end 1x1 —
in VMEM per batch element. The squeezed mel sequences are short (T <= ~768
frames), so a WHOLE sequence fits in VMEM: the grid is just (batch,), there
are no time tiles and therefore no halos. HBM traffic collapses to
read x_0 + write out (forward) and read x_0 + g + write dx_0 + weight
grads (backward, full recompute — no residuals are ever stored to HBM).

Semantics and parity notes (vs the flax path, flows.py:150-234):
  * Identical math at valid positions; masked positions follow the same
    masking points as the reference (start-conv output, per-layer residual,
    skip-sum before the end conv).
  * Weight-norm (w = g*v/||v||) is computed OUTSIDE the kernel in XLA (it
    is a per-parameter operation) and the normalized kernels are passed in;
    gradients flow through the normalization by ordinary autodiff around
    the custom_vjp.
  * Dropout uses the TPU hardware PRNG seeded per (batch, layer): forward
    and recompute-backward regenerate bit-identical masks without storing
    them. Same Bernoulli(keep)/(1-p) law as the flax path, different
    realization. No lowering exists on CPU, so train-mode with p>0 falls
    back to the flax path off-TPU (the caller handles this).
  * Speaker conditioning (g/gin_channels) is NOT fused — all shipped
    Glow-TTS configs run gin_channels=0; the caller falls back to the flax
    path when a conditioning tensor is present.

The affine mixing (m/logs split, exp, logdet) stays in XLA: it is cheap
elementwise work that fuses fine; only the conditioner is opaque.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class WNSpec:
    """Static configuration of one fused coupling conditioner."""

    half: int                 # in_channels // 2 (conditioner input width)
    hidden: int               # WN hidden channels
    out_channels: int         # end-conv output width (= in_channels)
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_drop: float
    interpret: bool = False

    def rs_channels(self, i: int) -> int:
        return 2 * self.hidden if i < self.n_layers - 1 else self.hidden


def _mix(seed, *vals):
    h = seed
    for v in vals:
        h = h * jnp.int32(1000003) + jnp.int32(v)
    return h


def _dot(a, b, dot_dtype):
    """Matmul in the activation dtype, f32 accumulate. For f32 activations
    request HIGHEST precision: inside Pallas a plain f32 dot lowers to a
    single-pass bf16 MXU matmul, which would make the "full precision" path
    LESS precise than XLA's default conv lowering (measured 7e-3 rel drift
    over the 10-conv stack). bf16 activations keep the fast single pass."""
    prec = jax.lax.Precision.HIGHEST if dot_dtype == jnp.float32 else None
    return jnp.dot(a.astype(dot_dtype), b.astype(dot_dtype),
                   precision=prec, preferred_element_type=jnp.float32)


def _keep_mask(spec: WNSpec, seed, b, layer, shape):
    """Regenerable dropout keep-mask * 1/(1-p) over `shape` (hardware PRNG)."""
    pltpu.prng_seed(_mix(seed, b, layer))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(int(spec.p_drop * (2 ** 32)))
    scale = jnp.float32(1.0 / (1.0 - spec.p_drop))
    return (bits >= threshold).astype(jnp.float32) * scale


def _zeros_pad(x, pad: int):
    """[T, C] -> [T + 2*pad, C] zero-padded (concat lowers fine in Pallas)."""
    if pad == 0:
        return x
    z = jnp.zeros((pad, x.shape[1]), x.dtype)
    return jnp.concatenate([z, x, z], axis=0)


def _dconv(x, kernel, bias, k: int, dil: int, dot_dtype):
    """Full-sequence dilated conv: x [T, C] -> [T, F]; SAME zero padding."""
    T = x.shape[0]
    pad = (k - 1) // 2 * dil
    xp = _zeros_pad(x, pad)
    out = jnp.broadcast_to(bias.astype(jnp.float32), (T, kernel.shape[-1]))
    for j in range(k):
        sl = xp[j * dil:j * dil + T]
        out = out + _dot(sl, kernel[j], dot_dtype)
    return out


def _dconv_t(dc, kernel, k: int, dil: int, dot_dtype):
    """Transpose of _dconv w.r.t. x: dc [T, F] -> dx [T, C]."""
    T = dc.shape[0]
    pad = (k - 1) // 2 * dil
    dcp = _zeros_pad(dc, pad)
    dx = jnp.zeros((T, kernel.shape[1]), jnp.float32)
    for j in range(k):
        sl = dcp[(k - 1 - j) * dil:(k - 1 - j) * dil + T]
        dx = dx + _dot(sl, kernel[j].T, dot_dtype)
    return dx


def _valid(T: int, length):
    r = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    return (r < length).astype(jnp.float32)


def _forward_body(spec: WNSpec, T: int, dot_dtype, seed, b, length,
                  x0, ws, bs, wins, bins, wrss, brss, save=None):
    """Shared fwd math; optionally records per-layer tensors into `save`."""
    H, k, L = spec.hidden, spec.kernel_size, spec.n_layers
    valid = _valid(T, length)
    h = (_dot(x0, ws, dot_dtype)
         + bs.astype(jnp.float32)) * valid
    x = h
    skip = jnp.zeros((T, H), jnp.float32)
    for i in range(L):
        dil = spec.dilation_rate ** i
        if save is not None:
            save["xs"][i] = x
        x_in = _dconv(x, wins[i], bins[i], k, dil, dot_dtype)
        if spec.p_drop > 0.0:
            x_in = x_in * _keep_mask(spec, seed, b, i, x_in.shape)
        if save is not None:
            save["xin"][i] = x_in
        t = jnp.tanh(x_in[:, :H])
        s = jax.nn.sigmoid(x_in[:, H:])
        acts = t * s
        rs = _dot(acts, wrss[i], dot_dtype) + brss[i].astype(jnp.float32)
        if i < L - 1:
            x = (x + rs[:, :H]) * valid
            skip = skip + rs[:, H:]
        else:
            skip = skip + rs
    return valid, skip


def _fwd_kernel(spec: WNSpec, T: int, dot_dtype,
                seed_ref, lens_ref, x0_ref, ws_ref, bs_ref, *rest):
    L = spec.n_layers
    wins, bins = rest[0:L], rest[L:2 * L]
    wrss, brss = rest[2 * L:3 * L], rest[3 * L:4 * L]
    wend_ref, bend_ref, out_ref = rest[4 * L], rest[4 * L + 1], rest[4 * L + 2]

    b = pl.program_id(0)
    seed = seed_ref[0]
    x0 = x0_ref[0]
    valid, skip = _forward_body(
        spec, T, dot_dtype, seed, b, lens_ref[b], x0,
        ws_ref[...], bs_ref[...],
        [w[...] for w in wins], [bb[...] for bb in bins],
        [w[...] for w in wrss], [bb[...] for bb in brss])
    out = _dot((skip * valid), wend_ref[...], dot_dtype) + bend_ref[...].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _conditioner_bwd(spec: WNSpec, T: int, dot_dtype, seed, b, length, x0,
                     ws, bs, wins, bins, wrss, brss, wend, dout,
                     xs_scr, xin_scr):
    """Recompute-forward + backward of the conditioner for one sequence.

    Returns (dx0 [T, half] f32, acc dict of weight-grad contributions,
    valid mask). Shared by the conditioner-only and flow-step kernels.
    """
    H, k, L = spec.hidden, spec.kernel_size, spec.n_layers

    # ---- recompute forward, saving per-layer inputs and gated pre-acts ----
    save = {"xs": xs_scr, "xin": xin_scr}
    valid, skip = _forward_body(
        spec, T, dot_dtype, seed, b, length, x0,
        ws, bs, wins, bins, wrss, brss, save=save)

    acc = {}
    h_end = skip * valid
    acc["dwend"] = _dot(h_end.T, dout, dot_dtype)
    acc["dbend"] = jnp.sum(dout, axis=0, keepdims=True)
    dskip = _dot(dout, wend.T, dot_dtype) * valid

    dx_next = jnp.zeros((T, H), jnp.float32)
    for i in reversed(range(L)):
        x_i = xs_scr[i]
        x_in = xin_scr[i]
        t = jnp.tanh(x_in[:, :H])
        s = jax.nn.sigmoid(x_in[:, H:])
        acts = t * s
        if i < L - 1:
            dres = dx_next * valid
            drs = jnp.concatenate([dres, dskip], axis=1)      # [T, 2H]
            dx_i = dres
        else:
            drs = dskip                                       # [T, H]
            dx_i = jnp.zeros((T, H), jnp.float32)
        acc[f"dwrs{i}"] = _dot(acts.T, drs, dot_dtype)
        acc[f"dbrs{i}"] = jnp.sum(drs, axis=0, keepdims=True)
        dacts = _dot(drs, wrss[i].T, dot_dtype)
        dxin = jnp.concatenate(
            [dacts * s * (1.0 - t * t), dacts * t * s * (1.0 - s)], axis=1)
        if spec.p_drop > 0.0:
            # xin_scr holds POST-dropout values; the conv cotangent needs the
            # same keep mask again (bit-identical regeneration by seed)
            dxin = dxin * _keep_mask(spec, seed, b, i, dxin.shape)
        dil = spec.dilation_rate ** i
        pad = (k - 1) // 2 * dil
        xip = _zeros_pad(x_i, pad)
        dk_taps = []
        for j in range(k):
            dk_taps.append(_dot(xip[j * dil:j * dil + T].T, dxin, dot_dtype))
        acc[f"dwin{i}"] = jnp.stack(dk_taps, axis=0)
        acc[f"dbin{i}"] = jnp.sum(dxin, axis=0, keepdims=True)
        dx_i = dx_i + _dconv_t(dxin, wins[i], k, dil, dot_dtype)
        dx_next = dx_i

    dh = dx_next * valid
    acc["dws"] = _dot(x0.T, dh, dot_dtype)
    acc["dbs"] = jnp.sum(dh, axis=0, keepdims=True)
    dx0 = _dot(dh, ws.T, dot_dtype)
    return dx0, acc, valid


def _accumulate(first, refs: dict, acc: dict):
    """First grid step initializes the f32 accumulators, later ones add."""
    @pl.when(first)
    def _():
        for key, ref in refs.items():
            ref[...] = acc[key]

    @pl.when(jnp.logical_not(first))
    def _():
        for key, ref in refs.items():
            ref[...] = ref[...] + acc[key]


def _bwd_kernel(spec: WNSpec, T: int, dot_dtype,
                seed_ref, lens_ref, x0_ref, g_ref, ws_ref, bs_ref, *rest):
    L = spec.n_layers
    wins, bins = rest[0:L], rest[L:2 * L]
    wrss, brss = rest[2 * L:3 * L], rest[3 * L:4 * L]
    wend_ref = rest[4 * L]
    outs = rest[4 * L + 2:]
    (dx0_ref, dws_ref, dbs_ref) = outs[0:3]
    dwins, dbins = outs[3:3 + L], outs[3 + L:3 + 2 * L]
    dwrss, dbrss = outs[3 + 2 * L:3 + 3 * L], outs[3 + 3 * L:3 + 4 * L]
    dwend_ref, dbend_ref = outs[3 + 4 * L], outs[3 + 4 * L + 1]
    xs_scr, xin_scr = outs[3 + 4 * L + 2], outs[3 + 4 * L + 3]

    b = pl.program_id(0)
    seed = seed_ref[0]
    first = b == 0
    dout = g_ref[0].astype(jnp.float32)

    dx0, acc, _ = _conditioner_bwd(
        spec, T, dot_dtype, seed, b, lens_ref[b], x0_ref[0],
        ws_ref[...], bs_ref[...],
        [w[...] for w in wins], [bb[...] for bb in bins],
        [w[...] for w in wrss], [bb[...] for bb in brss],
        wend_ref[...], dout, xs_scr, xin_scr)
    dx0_ref[0] = dx0.astype(dx0_ref.dtype)

    refs = {"dws": dws_ref, "dbs": dbs_ref, "dwend": dwend_ref, "dbend": dbend_ref}
    for i in range(L):
        refs[f"dwin{i}"] = dwins[i]
        refs[f"dbin{i}"] = dbins[i]
        refs[f"dwrs{i}"] = dwrss[i]
        refs[f"dbrs{i}"] = dbrss[i]
    _accumulate(first, refs, acc)


# ---------------------------------------------------------------------------
# flow-step variant: ActNorm + InvConvNear fused IN FRONT of the conditioner
# ---------------------------------------------------------------------------
#
# One Glow flow step is actnorm -> invconv -> coupling (reference
# modules.py:168-183). The conditioner kernel above already holds the whole
# squeezed sequence in VMEM; the two layers in front of it are a per-channel
# affine and a [C, C] channel mix — a few extra VPU ops and one MXU dot per
# sequence. Fusing them removes, per block: the ActNorm/InvConvNear HLO
# fusions, the grouped-conv reshape/transpose "data formatting" chains
# (Mosaic never sees them — the group structure is baked into a DENSE [C, C]
# matrix built in XLA from the 4x4 weight, so grads flow to the weight by
# autodiff through that construction), and two full HBM round trips of the
# activations. The logdet terms stay in XLA: actnorm/invconv logdets are
# pure functions of params and lengths; the coupling affine consumes the
# kernel's xc output exactly as the unfused path consumes InvConvNear's.
#
# Forward returns BOTH xc (the invconv output the affine needs) and the
# conditioner output; backward takes both cotangents.


def _fwd_flow_kernel(spec: WNSpec, T: int, dot_dtype,
                     seed_ref, lens_ref, x_ref, aln_ref, alb_ref, mt_ref,
                     ws_ref, bs_ref, *rest):
    L = spec.n_layers
    wins, bins = rest[0:L], rest[L:2 * L]
    wrss, brss = rest[2 * L:3 * L], rest[3 * L:4 * L]
    wend_ref, bend_ref = rest[4 * L], rest[4 * L + 1]
    xc_ref, out_ref = rest[4 * L + 2], rest[4 * L + 3]

    b = pl.program_id(0)
    seed = seed_ref[0]
    half = spec.half
    valid = _valid(T, lens_ref[b])
    x = x_ref[0].astype(jnp.float32)
    ex = jnp.exp(aln_ref[...].astype(jnp.float32))            # [1, C]
    x1 = (alb_ref[...].astype(jnp.float32) + ex * x) * valid  # actnorm
    xc = _dot(x1, mt_ref[...], dot_dtype)                     # invconv (dense)
    xc_ref[0] = xc.astype(xc_ref.dtype)

    x0 = xc[:, :half]
    _, skip = _forward_body(
        spec, T, dot_dtype, seed, b, lens_ref[b], x0,
        ws_ref[...], bs_ref[...],
        [w[...] for w in wins], [bb[...] for bb in bins],
        [w[...] for w in wrss], [bb[...] for bb in brss])
    out = _dot((skip * valid), wend_ref[...], dot_dtype) + bend_ref[...].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_flow_kernel(spec: WNSpec, T: int, dot_dtype,
                     seed_ref, lens_ref, x_ref, gxc_ref, gout_ref,
                     aln_ref, alb_ref, mt_ref, ws_ref, bs_ref, *rest):
    L = spec.n_layers
    wins, bins = rest[0:L], rest[L:2 * L]
    wrss, brss = rest[2 * L:3 * L], rest[3 * L:4 * L]
    wend_ref = rest[4 * L]
    outs = rest[4 * L + 2:]
    (dx_ref, daln_ref, dalb_ref, dmt_ref, dws_ref, dbs_ref) = outs[0:6]
    dwins, dbins = outs[6:6 + L], outs[6 + L:6 + 2 * L]
    dwrss, dbrss = outs[6 + 2 * L:6 + 3 * L], outs[6 + 3 * L:6 + 4 * L]
    dwend_ref, dbend_ref = outs[6 + 4 * L], outs[6 + 4 * L + 1]
    xs_scr, xin_scr = outs[6 + 4 * L + 2], outs[6 + 4 * L + 3]

    b = pl.program_id(0)
    seed = seed_ref[0]
    first = b == 0
    half = spec.half
    valid = _valid(T, lens_ref[b])

    # ---- recompute the prefix ----
    x = x_ref[0].astype(jnp.float32)
    ex = jnp.exp(aln_ref[...].astype(jnp.float32))
    x1 = (alb_ref[...].astype(jnp.float32) + ex * x) * valid
    xc = _dot(x1, mt_ref[...], dot_dtype)
    x0 = xc[:, :half]

    # ---- conditioner backward (recompute inside) ----
    dout = gout_ref[0].astype(jnp.float32)
    dx0, acc, _ = _conditioner_bwd(
        spec, T, dot_dtype, seed, b, lens_ref[b], x0,
        ws_ref[...], bs_ref[...],
        [w[...] for w in wins], [bb[...] for bb in bins],
        [w[...] for w in wrss], [bb[...] for bb in brss],
        wend_ref[...], dout, xs_scr, xin_scr)

    # ---- prefix backward ----
    gxc = gxc_ref[0].astype(jnp.float32) * valid
    dxc = jnp.concatenate([gxc[:, :half] + dx0, gxc[:, half:]], axis=1)
    acc["dmt"] = _dot(x1.T, dxc, dot_dtype)                   # xc = x1 @ mt
    dx1 = _dot(dxc, mt_ref[...].T, dot_dtype)
    acc["daln"] = jnp.sum(dx1 * ex * x * valid, axis=0, keepdims=True)
    acc["dalb"] = jnp.sum(dx1 * valid, axis=0, keepdims=True)
    dx_ref[0] = (dx1 * ex * valid).astype(dx_ref.dtype)

    refs = {"daln": daln_ref, "dalb": dalb_ref, "dmt": dmt_ref,
            "dws": dws_ref, "dbs": dbs_ref,
            "dwend": dwend_ref, "dbend": dbend_ref}
    for i in range(L):
        refs[f"dwin{i}"] = dwins[i]
        refs[f"dbin{i}"] = dbins[i]
        refs[f"dwrs{i}"] = dwrss[i]
        refs[f"dbrs{i}"] = dbrss[i]
    _accumulate(first, refs, acc)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _flops(spec: WNSpec, B: int, T: int, bwd: bool) -> pl.CostEstimate:
    """Analytic cost (pallas calls are opaque to XLA's FLOP counting)."""
    H = spec.hidden
    per_frame = 2 * spec.half * H                           # start 1x1
    for i in range(spec.n_layers):
        per_frame += 2 * spec.kernel_size * H * 2 * H       # dilated conv
        per_frame += 2 * H * spec.rs_channels(i)            # res/skip 1x1
    per_frame += 2 * H * spec.out_channels                  # end 1x1
    flops = B * T * per_frame
    trans = B * T * 2 * H * spec.n_layers                   # tanh + sigmoid
    if bwd:
        flops *= 3
        trans *= 2
    itemsize = 2
    bytes_accessed = B * T * (spec.half + spec.out_channels) * itemsize * (2 if bwd else 1)
    return pl.CostEstimate(flops=flops, transcendentals=trans,
                           bytes_accessed=bytes_accessed)


def _weight_specs(n: int):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


# The recompute backward holds per-layer scratch (L,T,H)+(L,T,2H) f32, the
# weight set, AND the f32 weight-grad accumulators in VMEM at once: 37.2 MB
# at the shipped Glow decoder scale (B=4, T=384, C=160, H=192, L=4), over
# Mosaic's default 16 MB scoped-vmem budget (hardware OOM, r4 wn_check).
# v5e has 128 MB of VMEM/core — raise the cap for the backward kernels only.
_BWD_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _row_spec(T: int, C: int):
    return pl.BlockSpec((1, T, C), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM)


def _fwd(spec: WNSpec, seed, lens, x0, ws, bs, wins, bins, wrss, brss, wend, bend):
    B, T, _ = x0.shape
    L = spec.n_layers
    dot_dtype = x0.dtype
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, T, dot_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[_row_spec(T, spec.half)] + _weight_specs(2 + 4 * L + 2),
            out_specs=_row_spec(T, spec.out_channels),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, spec.out_channels), x0.dtype),
        cost_estimate=_flops(spec, B, T, bwd=False),
        interpret=spec.interpret,
    )(seed, lens, x0, ws, bs, *wins, *bins, *wrss, *brss, wend, bend)
    return out


def _bwd(spec: WNSpec, seed, lens, x0, g, ws, bs, wins, bins, wrss, brss, wend, bend):
    B, T, _ = x0.shape
    H, L = spec.hidden, spec.n_layers
    dot_dtype = x0.dtype
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((B, T, spec.half), x0.dtype),               # dx0
        jax.ShapeDtypeStruct(ws.shape, f32),
        jax.ShapeDtypeStruct(bs.shape, f32),
        *[jax.ShapeDtypeStruct(w.shape, f32) for w in wins],
        *[jax.ShapeDtypeStruct(b_.shape, f32) for b_ in bins],
        *[jax.ShapeDtypeStruct(w.shape, f32) for w in wrss],
        *[jax.ShapeDtypeStruct(b_.shape, f32) for b_ in brss],
        jax.ShapeDtypeStruct(wend.shape, f32),
        jax.ShapeDtypeStruct(bend.shape, f32),
    )
    acc = lambda shape: pl.BlockSpec(shape, lambda b, *_: tuple(0 for _ in shape),
                                     memory_space=pltpu.VMEM)
    out_specs = (
        _row_spec(T, spec.half),
        acc(ws.shape), acc(bs.shape),
        *[acc(w.shape) for w in wins],
        *[acc(b_.shape) for b_ in bins],
        *[acc(w.shape) for w in wrss],
        *[acc(b_.shape) for b_ in brss],
        acc(wend.shape), acc(bend.shape),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, T, dot_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[_row_spec(T, spec.half), _row_spec(T, spec.out_channels)]
            + _weight_specs(2 + 4 * L + 2),
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((L, T, H), f32),       # per-layer inputs
                pltpu.VMEM((L, T, 2 * H), f32),   # per-layer post-dropout conv outs
            ],
        ),
        out_shape=out_shape,
        cost_estimate=_flops(spec, B, T, bwd=True),
        compiler_params=_BWD_COMPILER_PARAMS,
        interpret=spec.interpret,
    )(seed, lens, x0, g, ws, bs, *wins, *bins, *wrss, *brss, wend, bend)
    return outs


def _flow_flops(spec: WNSpec, B: int, T: int, bwd: bool) -> pl.CostEstimate:
    base = _flops(spec, B, T, bwd)
    C = spec.out_channels
    extra = B * T * 2 * C * C                                 # dense invconv
    if bwd:
        extra *= 3
    return pl.CostEstimate(flops=base.flops + extra,
                           transcendentals=base.transcendentals,
                           bytes_accessed=base.bytes_accessed)


def _fwd_flow(spec: WNSpec, seed, lens, x, aln, alb, mt,
              ws, bs, wins, bins, wrss, brss, wend, bend):
    B, T, C = x.shape
    L = spec.n_layers
    dot_dtype = x.dtype
    outs = pl.pallas_call(
        functools.partial(_fwd_flow_kernel, spec, T, dot_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[_row_spec(T, C)] + _weight_specs(3 + 2 + 4 * L + 2),
            out_specs=(_row_spec(T, C), _row_spec(T, spec.out_channels)),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), x.dtype),
                   jax.ShapeDtypeStruct((B, T, spec.out_channels), x.dtype)),
        cost_estimate=_flow_flops(spec, B, T, bwd=False),
        interpret=spec.interpret,
    )(seed, lens, x, aln, alb, mt, ws, bs, *wins, *bins, *wrss, *brss, wend, bend)
    return outs


def _bwd_flow(spec: WNSpec, seed, lens, x, g_xc, g_out, aln, alb, mt,
              ws, bs, wins, bins, wrss, brss, wend, bend):
    B, T, C = x.shape
    H, L = spec.hidden, spec.n_layers
    dot_dtype = x.dtype
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((B, T, C), x.dtype),                        # dx
        jax.ShapeDtypeStruct(aln.shape, f32),
        jax.ShapeDtypeStruct(alb.shape, f32),
        jax.ShapeDtypeStruct(mt.shape, f32),
        jax.ShapeDtypeStruct(ws.shape, f32),
        jax.ShapeDtypeStruct(bs.shape, f32),
        *[jax.ShapeDtypeStruct(w.shape, f32) for w in wins],
        *[jax.ShapeDtypeStruct(b_.shape, f32) for b_ in bins],
        *[jax.ShapeDtypeStruct(w.shape, f32) for w in wrss],
        *[jax.ShapeDtypeStruct(b_.shape, f32) for b_ in brss],
        jax.ShapeDtypeStruct(wend.shape, f32),
        jax.ShapeDtypeStruct(bend.shape, f32),
    )
    acc = lambda shape: pl.BlockSpec(shape, lambda b, *_: tuple(0 for _ in shape),
                                     memory_space=pltpu.VMEM)
    out_specs = (
        _row_spec(T, C),
        acc(aln.shape), acc(alb.shape), acc(mt.shape),
        acc(ws.shape), acc(bs.shape),
        *[acc(w.shape) for w in wins],
        *[acc(b_.shape) for b_ in bins],
        *[acc(w.shape) for w in wrss],
        *[acc(b_.shape) for b_ in brss],
        acc(wend.shape), acc(bend.shape),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_flow_kernel, spec, T, dot_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[_row_spec(T, C), _row_spec(T, C),
                      _row_spec(T, spec.out_channels)]
            + _weight_specs(3 + 2 + 4 * L + 2),
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((L, T, H), f32),       # per-layer inputs
                pltpu.VMEM((L, T, 2 * H), f32),   # per-layer post-dropout conv outs
            ],
        ),
        out_shape=out_shape,
        cost_estimate=_flow_flops(spec, B, T, bwd=True),
        compiler_params=_BWD_COMPILER_PARAMS,
        interpret=spec.interpret,
    )(seed, lens, x, g_xc, g_out, aln, alb, mt, ws, bs,
      *wins, *bins, *wrss, *brss, wend, bend)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_flow_step(spec: WNSpec, seed_f32, lens, x, aln, alb, mt,
                    ws, bs, wins, bins, wrss, brss, wend, bend):
    """(xc, cond_out) = flow-step prefix + conditioner; see section comment.

    x: [B, T, C] squeezed activations entering the flow step.
    aln/alb: [1, C] ActNorm logs/bias. mt: [C, C] dense InvConvNear matrix
    TRANSPOSED (xc = actnorm(x) @ mt), built in XLA from the 4x4 weight so
    its cotangent flows back to the weight by autodiff.
    Returns xc (the invconv output, which the affine coupling consumes) and
    the conditioner output.
    """
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    return _fwd_flow(spec, seed, lens, x, aln, alb, mt,
                     ws, bs, wins, bins, wrss, brss, wend, bend)


def _flow_vjp_fwd(spec, seed_f32, lens, x, aln, alb, mt,
                  ws, bs, wins, bins, wrss, brss, wend, bend):
    outs = fused_flow_step(spec, seed_f32, lens, x, aln, alb, mt,
                           ws, bs, wins, bins, wrss, brss, wend, bend)
    return outs, (seed_f32, lens, x, aln, alb, mt,
                  ws, bs, wins, bins, wrss, brss, wend, bend)


def _flow_vjp_bwd(spec, residuals, gs):
    (seed_f32, lens, x, aln, alb, mt,
     ws, bs, wins, bins, wrss, brss, wend, bend) = residuals
    g_xc, g_out = gs
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    L = spec.n_layers
    outs = _bwd_flow(spec, seed, lens, x, g_xc.astype(x.dtype),
                     g_out.astype(x.dtype), aln, alb, mt,
                     ws, bs, wins, bins, wrss, brss, wend, bend)
    (dx, daln, dalb, dmt, dws, dbs) = outs[0:6]
    dwins = outs[6:6 + L]
    dbins = outs[6 + L:6 + 2 * L]
    dwrss = outs[6 + 2 * L:6 + 3 * L]
    dbrss = outs[6 + 3 * L:6 + 4 * L]
    dwend, dbend = outs[6 + 4 * L], outs[6 + 4 * L + 1]

    cast = lambda v, like: v.astype(like.dtype)
    return (jnp.zeros_like(seed_f32), jnp.zeros_like(lens),
            cast(dx, x), cast(daln, aln), cast(dalb, alb), cast(dmt, mt),
            cast(dws, ws), cast(dbs, bs),
            tuple(cast(a, b) for a, b in zip(dwins, wins)),
            tuple(cast(a, b) for a, b in zip(dbins, bins)),
            tuple(cast(a, b) for a, b in zip(dwrss, wrss)),
            tuple(cast(a, b) for a, b in zip(dbrss, brss)),
            cast(dwend, wend), cast(dbend, bend))


fused_flow_step.defvjp(_flow_vjp_fwd, _flow_vjp_bwd)


def apply_fused_flow_step(spec: WNSpec, seed_f32, lens, x, aln, alb, mt,
                          ws, bs, wins, bins, wrss, brss, wend, bend):
    """SPMD-composing entry point (same pattern as apply_fused_wn_coupling)."""
    mesh = jax.sharding.get_abstract_mesh()
    axis = "data"
    if mesh is None or axis not in getattr(mesh, "axis_names", ()) \
            or mesh.shape[axis] <= 1 or x.shape[0] % mesh.shape[axis] != 0:
        return fused_flow_step(spec, seed_f32, lens, x, aln, alb, mt,
                               ws, bs, wins, bins, wrss, brss, wend, bend)

    from jax.sharding import PartitionSpec as P

    def per_shard(seed_s, lens_s, x_s, aln, alb, mt,
                  ws, bs, wins, bins, wrss, brss, wend, bend):
        bits = jax.lax.bitcast_convert_type(seed_s, jnp.int32)
        bits = bits + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(1640531527)
        seed_mixed = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return fused_flow_step(spec, seed_mixed, lens_s, x_s, aln, alb, mt,
                               ws, bs, wins, bins, wrss, brss, wend, bend)

    rep = P()
    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(rep, P(axis), P(axis), rep, rep, rep, rep, rep, rep, rep,
                  rep, rep, rep, rep),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )(seed_f32, lens, x, aln, alb, mt, ws, bs, wins, bins, wrss, brss, wend, bend)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_wn_coupling(spec: WNSpec, seed_f32, lens, x0,
                      ws, bs, wins, bins, wrss, brss, wend, bend):
    """out = end(WN(start(x0))) — the coupling conditioner; see module doc.

    seed_f32: float32 scalar carrying the int32 dropout seed bit pattern.
    lens: [B] int32 valid lengths (scalar-prefetched; replaces the mask).
    ws [half, H], bs [1, H]; wins/bins/wrss/brss: per-layer tuples
    ([k, H, 2H], [1, 2H], [H, rs_ch], [1, rs_ch]); wend [H, C_out],
    bend [1, C_out]. All weights are post-weight-norm.
    """
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    return _fwd(spec, seed, lens, x0, ws, bs, wins, bins, wrss, brss, wend, bend)


def _vjp_fwd(spec, seed_f32, lens, x0, ws, bs, wins, bins, wrss, brss, wend, bend):
    out = fused_wn_coupling(spec, seed_f32, lens, x0, ws, bs, wins, bins,
                            wrss, brss, wend, bend)
    return out, (seed_f32, lens, x0, ws, bs, wins, bins, wrss, brss, wend, bend)


def _vjp_bwd(spec, residuals, g):
    seed_f32, lens, x0, ws, bs, wins, bins, wrss, brss, wend, bend = residuals
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    L = spec.n_layers
    outs = _bwd(spec, seed, lens, x0, g.astype(x0.dtype),
                ws, bs, wins, bins, wrss, brss, wend, bend)
    dx0 = outs[0]
    dws, dbs = outs[1], outs[2]
    dwins = outs[3:3 + L]
    dbins = outs[3 + L:3 + 2 * L]
    dwrss = outs[3 + 2 * L:3 + 3 * L]
    dbrss = outs[3 + 3 * L:3 + 4 * L]
    dwend, dbend = outs[3 + 4 * L], outs[3 + 4 * L + 1]

    cast = lambda v, like: v.astype(like.dtype)
    return (jnp.zeros_like(seed_f32), jnp.zeros_like(lens),
            cast(dx0, x0), cast(dws, ws), cast(dbs, bs),
            tuple(cast(a, b) for a, b in zip(dwins, wins)),
            tuple(cast(a, b) for a, b in zip(dbins, bins)),
            tuple(cast(a, b) for a, b in zip(dwrss, wrss)),
            tuple(cast(a, b) for a, b in zip(dbrss, brss)),
            cast(dwend, wend), cast(dbend, bend))


fused_wn_coupling.defvjp(_vjp_fwd, _vjp_bwd)


def apply_fused_wn_coupling(spec: WNSpec, seed_f32, lens, x0,
                            ws, bs, wins, bins, wrss, brss, wend, bend):
    """SPMD-composing entry point (same pattern as gated_hifi):
    shard_map over the ambient 'data' mesh so the opaque custom call is
    partitioned instead of silently all-gathered + replicated."""
    mesh = jax.sharding.get_abstract_mesh()
    axis = "data"
    if mesh is None or axis not in getattr(mesh, "axis_names", ()) \
            or mesh.shape[axis] <= 1 or x0.shape[0] % mesh.shape[axis] != 0:
        return fused_wn_coupling(spec, seed_f32, lens, x0, ws, bs, wins, bins,
                                 wrss, brss, wend, bend)

    from jax.sharding import PartitionSpec as P

    def per_shard(seed_s, lens_s, x0_s, ws, bs, wins, bins, wrss, brss, wend, bend):
        bits = jax.lax.bitcast_convert_type(seed_s, jnp.int32)
        bits = bits + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(1640531527)
        seed_mixed = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return fused_wn_coupling(spec, seed_mixed, lens_s, x0_s, ws, bs,
                                 wins, bins, wrss, brss, wend, bend)

    rep = P()
    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(rep, P(axis), P(axis), rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=P(axis),
        check_vma=False,
    )(seed_f32, lens, x0, ws, bs, wins, bins, wrss, brss, wend, bend)
