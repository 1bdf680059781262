"""Fused GatedHiFi block as Pallas TPU kernels (forward + recompute backward).

Why this kernel exists: the GatedHiFi residual block (reference
models/vqvae/resnet.py:184-241; flax path models/vqvae/blocks.py:
GatedHiFiBlock) dominates the VQ-VAE train step, and on v5e the XLA path is
**HBM-bandwidth-bound**: every branch materializes its expand, dropout,
conv, 1x1 and gating tensors to HBM (~10 round trips of [B, T, 2W] per
block, x2 in the backward). The device trace of the shipped step shows
~59% of time bandwidth-bound at ~13% MFU (BASELINE.md).

This kernel computes the ENTIRE block — 4-branch 1x1 expand, per-branch
(dropout -> relu -> dilated conv -> dropout -> relu -> 1x1 -> residual),
softmax/tanh gating, gate 1x1, block residual — in VMEM per time tile:

  * HBM traffic collapses to: read x once, write out once (forward);
    read x + g, write dx + weight grads (backward). Nothing intermediate
    ever touches HBM.
  * The backward saves NO residuals: it re-derives everything in-tile from
    x and the dropout seeds (recompute costs FLOPs, which the chip has
    idle; it was starved for bytes).
  * Dropout masks are generated with the on-chip PRNG, seeded per
    (batch, branch, absolute 128-frame chunk) so forward and backward
    regenerate bit-identical masks without storing them, and halo
    recomputation in neighboring tiles agrees with the owning tile. One
    u32 generation feeds both dropout sites of a branch (hi/lo 16-bit
    fields, keep-prob quantized to 2^-16 — see _branch_masks).

Semantics and parity notes (vs the flax path, blocks.py:210-276):
  * Identical math at VALID positions. At masked/padded positions the flax
    path returns ``x + scale*v`` while this kernel returns
    ``x*m + scale*v``; every downstream consumer multiplies by the mask
    before mixing time (MaskedConv1d, losses), so valid outputs are
    unaffected. The caller passes pre-masked input (x*m).
  * Dilated convs zero-pad outside the true sequence exactly like the
    reference (torch Conv1d SAME padding): positions >= T are masked to
    zero before every conv so bias garbage in the tile padding can never
    leak into valid outputs.
  * Dropout is distributionally identical (Bernoulli keep * 1/(1-p)) but
    uses the TPU hardware PRNG rather than threefry, so the mask
    realization differs from the flax path for the same key. Training
    semantics only; eval (deterministic) is bit-comparable.

Halo handling: each grid step receives three consecutive tiles of the
UNPADDED input via overlapping BlockSpecs whose index maps clamp the
neighbor index to [0, n_tiles-1] (no host-side jnp.pad: padding a
[B, T, W] level-0 activation costs two full HBM round trips per pallas
call — measured ~5 ms/step of pure `pad` ops). Rows whose absolute
position falls outside [0, T) therefore contain arbitrary data (clamped
duplicates or an uninitialized partial tail block); the kernels multiply
the input window by the validity mask up front, which reproduces
zero-padding semantics exactly. This keeps all DMA on the standard Pallas
pipeline (double-buffered) with no manual semaphores. Requires
2*halo <= tile.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# dropout mask chunk: masks are a pure function of the absolute
# (chunk-of-128-frames) index, so any tile regenerates identical bits
CHUNK = 128


@dataclass(frozen=True)
class GatedHiFiSpec:
    """Static configuration of one fused block (hashable; nondiff arg)."""

    n_in: int                    # W: block width
    kernels: Tuple[int, ...]     # per-branch conv kernel sizes
    dilations: Tuple[int, ...]   # per-branch conv dilations
    res_scale: float             # residual scale (1.0 or 1/sqrt(depth))
    p_drop: float                # dropout rate (0.0 = no dropout)
    tile_fwd: int = 384
    tile_bwd: int = 768
    interpret: bool = False

    @property
    def depth(self) -> int:
        return len(self.kernels)

    @property
    def hidden(self) -> int:     # H = 2W: branch width
        return 2 * self.n_in

    @property
    def halo(self) -> int:
        h = max((k - 1) // 2 * d for k, d in zip(self.kernels, self.dilations))
        return -(-h // CHUNK) * CHUNK  # chunk-aligned

    def check(self):
        assert self.tile_fwd % CHUNK == 0 and self.tile_bwd % CHUNK == 0
        assert 2 * self.halo <= self.tile_bwd and self.halo <= self.tile_fwd, (
            f"halo {self.halo} too large for tiles "
            f"({self.tile_fwd}/{self.tile_bwd})")


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------
def _mix(seed, *vals):
    """Integer hash mixing for dropout chunk seeds (int32, wraps)."""
    h = seed
    for v in vals:
        h = h * jnp.int32(1000003) + jnp.int32(v)
    return h


def _branch_masks(spec: GatedHiFiSpec, seed, b, d, chunk0, rows, cols):
    """Both dropout masks of branch ``d`` over ``rows`` CHUNK-aligned rows.

    ONE u32 PRNG generation per (branch, absolute chunk) feeds BOTH dropout
    sites of the branch: site 0 (pre-conv) keeps where the high 16 bits
    clear the threshold, site 1 (post-conv) uses the low 16 bits. The bits
    are keyed by absolute chunk, so any tile (fwd or bwd, any tile size)
    regenerates identical masks. Keep probability is quantized to
    round((1-p)*2^16)/2^16 — within 2^-17 of exact (vs the previous 2^-33),
    far below statistical detectability; bit generation was ~18% of kernel
    time and this halves it per use site while the backward drops from
    ~5 regenerations per site to 1.

    Returns (m0, m1), each [rows, cols] float32 keep*1/(1-p) masks, or
    (None, None) when p_drop == 0.
    """
    if spec.p_drop <= 0.0:
        return None, None
    keep_scale = jnp.float32(1.0 / (1.0 - spec.p_drop))
    th = jnp.uint32(max(1, int(spec.p_drop * 65536.0 + 0.5)))
    m0s, m1s = [], []
    for ci in range(rows // CHUNK):
        pltpu.prng_seed(_mix(seed, b, d, chunk0 + ci))
        bits = pltpu.bitcast(pltpu.prng_random_bits((CHUNK, cols)), jnp.uint32)
        m0s.append(((bits >> 16) >= th).astype(jnp.float32) * keep_scale)
        m1s.append(((bits & jnp.uint32(0xFFFF)) >= th).astype(jnp.float32) * keep_scale)
    return jnp.concatenate(m0s, axis=0), jnp.concatenate(m1s, axis=0)


def _mask_mul(x, m):
    """x * m with m possibly None (p_drop == 0)."""
    return x if m is None else x * m


import os as _os

# im2col taps: concatenate the k shifted input windows along the channel
# axis and run ONE [rows, k*H] x [k*H, H] matmul instead of k separate
# [rows, H] x [H, H] matmuls. REJECTED on this Mosaic version: lane-dim
# concatenation of row-shifted slices fails to compile ("result/input
# offset mismatch on non-concat dimension") because dilated shifts are not
# sublane(8)-aligned. Kept behind GH_IM2COL=1 for future toolchains.
_IM2COL = _os.environ.get("GH_IM2COL", "0") == "1"


def _dconv(a, kernel, bias, k: int, dil: int, off: int, out_len: int, dot_dtype):
    """Dilated conv: a [rows, H] -> c [out_len, H] at positions off..off+out_len.

    SAME-padding semantics are the caller's job (a must be zero outside the
    true sequence). All slices are static.
    """
    half = (k - 1) // 2
    if _IM2COL and k > 1:
        sls = [a[off + (j - half) * dil:off + (j - half) * dil + out_len]
               for j in range(k)]
        acat = jnp.concatenate(sls, axis=1)                  # [out_len, k*H]
        kcat = kernel.reshape(k * kernel.shape[1], kernel.shape[2])
        return (jnp.dot(acat.astype(dot_dtype), kcat.astype(dot_dtype),
                        preferred_element_type=jnp.float32)
                + bias.astype(jnp.float32))
    c = jnp.broadcast_to(bias.astype(jnp.float32), (out_len, bias.shape[-1]))
    for j in range(k):
        start = off + (j - half) * dil
        sl = a[start:start + out_len]
        c = c + jnp.dot(sl.astype(dot_dtype), kernel[j].astype(dot_dtype),
                        preferred_element_type=jnp.float32)
    return c


def _dconv_t(dc, kernel, k: int, dil: int, off: int, out_len: int, dot_dtype):
    """Transpose of _dconv: dc [rows, H] -> da [out_len, H] (grad w.r.t. a)."""
    half = (k - 1) // 2
    if _IM2COL and k > 1:
        sls = [dc[off - (j - half) * dil:off - (j - half) * dil + out_len]
               for j in range(k)]
        dcat = jnp.concatenate(sls, axis=1)                  # [out_len, k*H]
        # row block j multiplies kernel[j].T
        kcat = kernel.transpose(0, 2, 1).reshape(k * kernel.shape[2], kernel.shape[1])
        return jnp.dot(dcat.astype(dot_dtype), kcat.astype(dot_dtype),
                       preferred_element_type=jnp.float32)
    da = jnp.zeros((out_len, kernel.shape[-1]), jnp.float32)
    for j in range(k):
        start = off - (j - half) * dil
        sl = dc[start:start + out_len]
        da = da + jnp.dot(sl.astype(dot_dtype), kernel[j].T.astype(dot_dtype),
                          preferred_element_type=jnp.float32)
    return da


def _valid_mask(rows: int, t0, T: int):
    """[rows, 1] float32: 1 where absolute position t0+r is in [0, T)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + t0
    return ((r >= 0) & (r < T)).astype(jnp.float32)


def _softmax_gate(ts, ss):
    """tanh(t_d) weighted by softmax over the branch axis of s_d."""
    s_max = ss[0]
    for s in ss[1:]:
        s_max = jnp.maximum(s_max, s)
    exps = [jnp.exp(s - s_max) for s in ss]
    den = exps[0]
    for e in exps[1:]:
        den = den + e
    u = jnp.zeros_like(ts[0])
    ps = [e / den for e in exps]
    for t, p in zip(ts, ps):
        u = u + jnp.tanh(t) * p
    return u, ps


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------
def _fwd_kernel(spec: GatedHiFiSpec, T: int, dot_dtype,
                seed_ref, lens_ref, xp_ref, xc_ref, xn_ref,
                wall_ref, ball_ref, *rest):
    depth, W, H = spec.depth, spec.n_in, spec.hidden
    ks, bs = rest[0:depth], rest[depth:2 * depth]
    w1s, b1s = rest[2 * depth:3 * depth], rest[3 * depth:4 * depth]
    wg_ref, bg_ref, out_ref = rest[4 * depth], rest[4 * depth + 1], rest[4 * depth + 2]

    b = pl.program_id(0)
    i = pl.program_id(1)
    Tt, halo = spec.tile_fwd, spec.halo
    Tp = Tt + 2 * halo
    seed = seed_ref[0]

    # window = center tile +- halo, from the three consecutive tiles
    x3 = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
    xw = x3[Tt - halo:Tt - halo + Tp]                       # [Tp, W]
    t0 = i * Tt - halo                                      # absolute pos of row 0
    chunk0 = t0 // CHUNK
    valid = _valid_mask(Tp, t0, T)
    # rows outside [0, T) hold clamped-duplicate or uninitialized data
    # (see module docstring); zero them to get zero-padding semantics.
    # where (not *) so an uninitialized-NaN bit pattern cannot propagate
    xw = jnp.where(valid > 0, xw, jnp.zeros_like(xw))

    z_all = jnp.dot(xw.astype(dot_dtype), wall_ref[...].astype(dot_dtype),
                    preferred_element_type=jnp.float32) + ball_ref[...].astype(jnp.float32)

    ts, ss = [], []
    for d in range(depth):
        z = z_all[:, d * H:(d + 1) * H]                     # [Tp, H]
        m0, m1 = _branch_masks(spec, seed, b, d, chunk0, Tp, H)
        a = _mask_mul(jnp.maximum(z, 0.0), m0) * valid
        c = _dconv(a, ks[d][...], bs[d][...], spec.kernels[d], spec.dilations[d],
                   halo, Tt, dot_dtype)                     # [Tt, H]
        h1 = _mask_mul(jnp.maximum(c, 0.0),
                       None if m1 is None else m1[halo:halo + Tt])
        h = jnp.dot(h1.astype(dot_dtype), w1s[d][...].astype(dot_dtype),
                    preferred_element_type=jnp.float32) + b1s[d][...].astype(jnp.float32)
        zp = z[halo:halo + Tt] + spec.res_scale * h         # [Tt, H]
        ts.append(zp[:, :W])
        ss.append(zp[:, W:])

    u, _ = _softmax_gate(ts, ss)                            # [Tt, W]
    v = jnp.dot(u.astype(dot_dtype), wg_ref[...].astype(dot_dtype),
                preferred_element_type=jnp.float32) + bg_ref[...].astype(jnp.float32)
    out = xw[halo:halo + Tt].astype(jnp.float32) + spec.res_scale * v
    # per-SEQUENCE output masking: bitwise-equal to out * mask downstream,
    # letting the next MaskedConv skip its x*mask HBM round trip. Note this
    # is OUTPUT masking only — in-block math (incl. the reference's bias
    # leak across the length boundary) is untouched.
    vl = _valid_mask(Tt, i * Tt, jnp.minimum(T, lens_ref[b]))
    out_ref[0] = (out * vl).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel (full recompute; accumulates weight grads across the grid)
# ---------------------------------------------------------------------------
def _bwd_kernel(spec: GatedHiFiSpec, T: int, dot_dtype,
                seed_ref, lens_ref, xp_ref, xc_ref, xn_ref, gp_ref, gc_ref, gn_ref,
                wall_ref, ball_ref, *rest):
    depth, W, H = spec.depth, spec.n_in, spec.hidden
    ks = rest[0:depth]
    w1s = rest[2 * depth:3 * depth]
    wg_ref = rest[4 * depth]
    outs = rest[4 * depth + 2:]
    (dx_ref, dwall_ref, dball_ref) = outs[0:3]
    dks, dbs = outs[3:3 + depth], outs[3 + depth:3 + 2 * depth]
    dw1s, db1s = outs[3 + 2 * depth:3 + 3 * depth], outs[3 + 3 * depth:3 + 4 * depth]
    dwg_ref, dbg_ref = outs[3 + 4 * depth], outs[3 + 4 * depth + 1]
    zp_scr, c_scr = outs[3 + 4 * depth + 2], outs[3 + 4 * depth + 3]

    b = pl.program_id(0)
    i = pl.program_id(1)
    Tt, halo = spec.tile_bwd, spec.halo
    Tp = Tt + 4 * halo            # x window: center +- 2*halo
    Tm = Tt + 2 * halo            # "mid" window: center +- halo
    scale = spec.res_scale
    seed = seed_ref[0]

    first = jnp.logical_and(b == 0, i == 0)

    x3 = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
    xw = x3[Tt - 2 * halo:Tt - 2 * halo + Tp]               # [Tp, W]
    g3 = jnp.concatenate([gp_ref[0], gc_ref[0], gn_ref[0]], axis=0)
    gw = g3[Tt - halo:Tt - halo + Tm].astype(jnp.float32)   # [Tm, W]

    t0 = i * Tt - 2 * halo
    chunk0 = t0 // CHUNK
    valid_p = _valid_mask(Tp, t0, T)
    # zero rows outside [0, T) (clamped/uninitialized blocks, see module
    # docstring) so recompute and cotangent flow see zero-padding
    # semantics; where (not *) so uninitialized NaN cannot propagate
    xw = jnp.where(valid_p > 0, xw, jnp.zeros_like(xw))
    # cotangent of the len-masked output: rows past the sequence length
    # carry no gradient (g * mask downstream was the old equivalent)
    valid_m = _valid_mask(Tm, i * Tt - halo, jnp.minimum(T, lens_ref[b]))
    gw = jnp.where(valid_m > 0, gw, jnp.zeros_like(gw))

    z_all = jnp.dot(xw.astype(dot_dtype), wall_ref[...].astype(dot_dtype),
                    preferred_element_type=jnp.float32) + ball_ref[...].astype(jnp.float32)

    # ---- pass 1: recompute zp_d and c_d on the mid window --------------------
    for d in range(depth):
        z = z_all[:, d * H:(d + 1) * H]
        m0, m1 = _branch_masks(spec, seed, b, d, chunk0, Tp, H)
        a = _mask_mul(jnp.maximum(z, 0.0), m0) * valid_p
        c = _dconv(a, ks[d][...], rest[depth + d][...], spec.kernels[d],
                   spec.dilations[d], halo, Tm, dot_dtype)  # [Tm, H]
        h1 = _mask_mul(jnp.maximum(c, 0.0),
                       None if m1 is None else m1[halo:halo + Tm])
        h = jnp.dot(h1.astype(dot_dtype), w1s[d][...].astype(dot_dtype),
                    preferred_element_type=jnp.float32) + rest[3 * depth + d][...].astype(jnp.float32)
        zp_scr[d] = (z[halo:halo + Tm] + scale * h)
        c_scr[d] = c

    # ---- gating recompute + backward on the mid window ----------------------
    ts = [zp_scr[d][:, :W] for d in range(depth)]
    ss = [zp_scr[d][:, W:] for d in range(depth)]
    u, ps = _softmax_gate(ts, ss)                           # [Tm, W]
    dv = scale * gw                                         # d loss/d v
    du = jnp.dot(dv.astype(dot_dtype), wg_ref[...].T.astype(dot_dtype),
                 preferred_element_type=jnp.float32)        # [Tm, W]

    ctr = slice(halo, halo + Tt)                            # mid -> center rows
    # gate-conv weight grads (center rows only: each frame counted once)
    dwg_c = jnp.dot(u[ctr].astype(dot_dtype).T, dv[ctr].astype(dot_dtype),
                    preferred_element_type=jnp.float32)
    dbg_c = jnp.sum(dv[ctr], axis=0, keepdims=True)

    @pl.when(first)
    def _():
        dwg_ref[...] = dwg_c
        dbg_ref[...] = dbg_c

    @pl.when(jnp.logical_not(first))
    def _():
        dwg_ref[...] = dwg_ref[...] + dwg_c
        dbg_ref[...] = dbg_ref[...] + dbg_c

    # ---- per-branch backward -------------------------------------------------
    dz_parts = []
    for d in range(depth):
        tanh_t = jnp.tanh(ts[d])
        dt = du * ps[d] * (1.0 - tanh_t * tanh_t)
        dsd = du * ps[d] * (tanh_t - u)
        dzp = jnp.concatenate([dt, dsd], axis=1)            # [Tm, H]

        # regenerate this branch's two masks once; every dropout use below
        # (h1, the dc indicator, a, drop1_ind) slices from these
        m0, m1 = _branch_masks(spec, seed, b, d, chunk0, Tp, H)
        m1_mid = None if m1 is None else m1[halo:halo + Tm]

        c = c_scr[d][...]
        relu_c = jnp.maximum(c, 0.0)
        h1 = _mask_mul(relu_c, m1_mid)
        # dW1/db1 from center rows
        dh_c = scale * dzp[ctr]
        dw1_c = jnp.dot(h1[ctr].astype(dot_dtype).T, dh_c.astype(dot_dtype),
                        preferred_element_type=jnp.float32)
        db1_c = jnp.sum(dh_c, axis=0, keepdims=True)
        # grad at conv output (mid rows; halo needed for the transpose conv)
        dh1 = scale * jnp.dot(dzp.astype(dot_dtype), w1s[d][...].T.astype(dot_dtype),
                              preferred_element_type=jnp.float32)
        # backward through dropout2(relu(c)): same mask times the relu gate
        dc = _mask_mul(dh1, m1_mid) * (c > 0).astype(jnp.float32)

        # conv weight grads: dK[j] = sum_center a[t+off_j]^T dc[t]
        a = _mask_mul(jnp.maximum(z_all[:, d * H:(d + 1) * H], 0.0), m0) * valid_p
        k, dil = spec.kernels[d], spec.dilations[d]
        half = (k - 1) // 2
        dc_c = dc[ctr]                                      # [Tt, H]
        if _IM2COL and k > 1:
            # one [k*H, Tt] x [Tt, H] matmul for all taps' weight grads
            acat = jnp.concatenate(
                [a[2 * halo + (j - half) * dil:2 * halo + (j - half) * dil + Tt]
                 for j in range(k)], axis=1)                # [Tt, k*H]
            dk_all = jnp.dot(acat.astype(dot_dtype).T, dc_c.astype(dot_dtype),
                             preferred_element_type=jnp.float32).reshape(k, H, H)
        else:
            dk_c = []
            for j in range(k):
                start = 2 * halo + (j - half) * dil
                dk_c.append(jnp.dot(a[start:start + Tt].astype(dot_dtype).T,
                                    dc_c.astype(dot_dtype),
                                    preferred_element_type=jnp.float32))
            dk_all = jnp.stack(dk_c, axis=0)
        db_c = jnp.sum(dc_c, axis=0, keepdims=True)

        @pl.when(first)
        def _(d=d, dk_all=dk_all, db_c=db_c, dw1_c=dw1_c, db1_c=db1_c):
            dks[d][...] = dk_all
            dbs[d][...] = db_c
            dw1s[d][...] = dw1_c
            db1s[d][...] = db1_c

        @pl.when(jnp.logical_not(first))
        def _(d=d, dk_all=dk_all, db_c=db_c, dw1_c=dw1_c, db1_c=db1_c):
            dks[d][...] = dks[d][...] + dk_all
            dbs[d][...] = dbs[d][...] + db_c
            dw1s[d][...] = dw1s[d][...] + dw1_c
            db1s[d][...] = db1s[d][...] + db1_c

        # grad into the branch input z_d at center rows:
        #   residual path + conv-transpose path through dropout1(relu(z))
        da = _dconv_t(dc, ks[d][...], k, dil, halo, Tt, dot_dtype)  # [Tt, H]
        z_c = z_all[2 * halo:2 * halo + Tt, d * H:(d + 1) * H]
        drop1_ind = _mask_mul((z_c > 0).astype(jnp.float32),
                              None if m0 is None else m0[2 * halo:2 * halo + Tt])
        dz_c = dzp[ctr] + da * drop1_ind * valid_p[2 * halo:2 * halo + Tt]
        dz_parts.append(dz_c)

    dz_all = jnp.concatenate(dz_parts, axis=1)              # [Tt, 4H]

    xw_c = xw[2 * halo:2 * halo + Tt]
    dwall_c = jnp.dot(xw_c.astype(dot_dtype).T, dz_all.astype(dot_dtype),
                      preferred_element_type=jnp.float32)
    dball_c = jnp.sum(dz_all, axis=0, keepdims=True)

    @pl.when(first)
    def _():
        dwall_ref[...] = dwall_c
        dball_ref[...] = dball_c

    @pl.when(jnp.logical_not(first))
    def _():
        dwall_ref[...] = dwall_ref[...] + dwall_c
        dball_ref[...] = dball_ref[...] + dball_c

    dx = jnp.dot(dz_all.astype(dot_dtype), wall_ref[...].T.astype(dot_dtype),
                 preferred_element_type=jnp.float32) + gw[ctr]
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _block_flops(spec: GatedHiFiSpec, B: int, T: int, bwd: bool) -> pl.CostEstimate:
    """Analytic cost for XLA's scheduler AND for honest cost_analysis MFU:
    pallas kernels are opaque to XLA's own FLOP counting, so without this the
    benchmark reports would silently undercount the fused step's work."""
    W, H = spec.n_in, spec.hidden
    per_frame = 2 * W * len(spec.kernels) * H      # branch expand
    per_frame += sum(2 * k * H * H for k in spec.kernels)   # dilated convs
    per_frame += len(spec.kernels) * 2 * H * H     # branch 1x1s
    per_frame += 2 * W * W                         # gate 1x1
    flops = B * T * per_frame
    trans = B * T * 2 * len(spec.kernels) * W      # tanh + exp per branch
    if bwd:
        # recompute fwd + dgrad conv transpose + wgrad matmuls ~ 3x fwd
        flops *= 3
        trans *= 2
    itemsize = 2  # bf16-dominant
    bytes_accessed = B * T * W * itemsize * (4 if bwd else 2)
    return pl.CostEstimate(flops=flops, transcendentals=trans,
                           bytes_accessed=bytes_accessed)

def _halo_specs(tile: int, W: int, n_tiles: int):
    """Three overlapping BlockSpecs (prev/cur/next tile) over the unpadded
    array; neighbor indices clamp to the array so no block read is OOB."""
    def spec(delta):
        def imap(b, i, *_, delta=delta):
            return (b, jnp.clip(i + delta, 0, n_tiles - 1), 0)
        return pl.BlockSpec((1, tile, W), imap, memory_space=pltpu.VMEM)
    return [spec(-1), spec(0), spec(1)]


def _weight_specs(n: int):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def _fwd(spec: GatedHiFiSpec, seed, lens, xm, wall, ball, ks, bs, w1s, b1s, wg, bg):
    B, T, W = xm.shape
    depth, H = spec.depth, spec.hidden
    dot_dtype = xm.dtype
    tile = spec.tile_fwd
    n_tiles = -(-T // tile)

    grid = (B, n_tiles)
    in_specs = (
        _halo_specs(tile, W, n_tiles)
        + _weight_specs(2 + 4 * depth + 2)
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, T, dot_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, tile, W), lambda b, i, *_: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, W), xm.dtype),
        cost_estimate=_block_flops(spec, B, T, bwd=False),
        interpret=spec.interpret,
    )(seed, lens, xm, xm, xm, wall, ball, *ks, *bs, *w1s, *b1s, wg, bg)
    return out


def _bwd(spec: GatedHiFiSpec, seed, lens, xm, g, wall, ball, ks, bs, w1s, b1s, wg, bg):
    B, T, W = xm.shape
    depth, H = spec.depth, spec.hidden
    dot_dtype = xm.dtype
    tile = spec.tile_bwd
    Tm = tile + 2 * spec.halo
    n_tiles = -(-T // tile)
    gc = g.astype(xm.dtype)

    acc = lambda shape: pl.BlockSpec(shape, lambda b, i, *_: tuple(0 for _ in shape),
                                     memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((B, T, W), xm.dtype),                       # dx
        jax.ShapeDtypeStruct((W, depth * H), f32),                       # dWall
        jax.ShapeDtypeStruct((1, depth * H), f32),                       # dball
        *[jax.ShapeDtypeStruct((k, H, H), f32) for k in spec.kernels],   # dK_d
        *[jax.ShapeDtypeStruct((1, H), f32) for _ in range(depth)],      # db_d
        *[jax.ShapeDtypeStruct((H, H), f32) for _ in range(depth)],      # dW1_d
        *[jax.ShapeDtypeStruct((1, H), f32) for _ in range(depth)],      # db1_d
        jax.ShapeDtypeStruct((W, W), f32),                               # dWg
        jax.ShapeDtypeStruct((1, W), f32),                               # dbg
    )
    out_specs = (
        pl.BlockSpec((1, tile, W), lambda b, i, *_: (b, i, 0), memory_space=pltpu.VMEM),
        acc((W, depth * H)),
        acc((1, depth * H)),
        *[acc((k, H, H)) for k in spec.kernels],
        *[acc((1, H)) for _ in range(depth)],
        *[acc((H, H)) for _ in range(depth)],
        *[acc((1, H)) for _ in range(depth)],
        acc((W, W)),
        acc((1, W)),
    )
    grid = (B, n_tiles)
    halo3 = _halo_specs(tile, W, n_tiles)
    in_specs = (
        halo3 + halo3
        + _weight_specs(2 + 4 * depth + 2)
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, T, dot_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((depth, Tm, H), f32),   # zp scratch
                pltpu.VMEM((depth, Tm, H), f32),   # c scratch
            ],
        ),
        out_shape=out_shape,
        cost_estimate=_block_flops(spec, B, T, bwd=True),
        interpret=spec.interpret,
    )(seed, lens, xm, xm, xm, gc, gc, gc, wall, ball, *ks, *bs, *w1s, *b1s, wg, bg)

    return outs[0], outs[1:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_gated_hifi(spec: GatedHiFiSpec, seed_f32, lens, xm, wall, ball,
                     ks, bs, w1s, b1s, wg, bg):
    """out = (xm + res_scale * GatedHiFi(xm)) * seq_mask; see module docstring.

    seed_f32: float32 scalar holding the int32 dropout seed bit pattern
    (float so custom_vjp cotangent plumbing stays all-float).
    lens: [B] int32 valid lengths — the output is masked past them (bitwise
    what out * mask produced downstream before; consumers may skip it).
    ks/bs/w1s/b1s are tuples of per-branch params: conv kernel [k, H, H],
    conv bias [1, H], 1x1 kernel [H, H], 1x1 bias [1, H]. wall [W, 4H],
    ball [1, 4H], wg [W, W], bg [1, W].
    """
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    return _fwd(spec, seed, lens, xm, wall, ball, ks, bs, w1s, b1s, wg, bg)


def _vjp_fwd(spec, seed_f32, lens, xm, wall, ball, ks, bs, w1s, b1s, wg, bg):
    out = fused_gated_hifi(spec, seed_f32, lens, xm, wall, ball, ks, bs, w1s, b1s, wg, bg)
    return out, (seed_f32, lens, xm, wall, ball, ks, bs, w1s, b1s, wg, bg)


def _vjp_bwd(spec, residuals, g):
    seed_f32, lens, xm, wall, ball, ks, bs, w1s, b1s, wg, bg = residuals
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    depth = spec.depth
    dx, rest = _bwd(spec, seed, lens, xm, g, wall, ball, ks, bs, w1s, b1s, wg, bg)
    dwall, dball = rest[0], rest[1]
    dks = rest[2:2 + depth]
    dbs = rest[2 + depth:2 + 2 * depth]
    dw1s = rest[2 + 2 * depth:2 + 3 * depth]
    db1s = rest[2 + 3 * depth:2 + 4 * depth]
    dwg, dbg = rest[2 + 4 * depth], rest[2 + 4 * depth + 1]

    cast = lambda v, like: v.astype(like.dtype)
    return (jnp.zeros_like(seed_f32), jnp.zeros_like(lens),
            cast(dx, xm),
            cast(dwall, wall), cast(dball, ball),
            tuple(cast(a, b) for a, b in zip(dks, ks)),
            tuple(cast(a, b) for a, b in zip(dbs, bs)),
            tuple(cast(a, b) for a, b in zip(dw1s, w1s)),
            tuple(cast(a, b) for a, b in zip(db1s, b1s)),
            cast(dwg, wg), cast(dbg, bg))


fused_gated_hifi.defvjp(_vjp_fwd, _vjp_bwd)


def apply_fused_gated_hifi(spec: GatedHiFiSpec, seed_f32, lens, xm, wall, ball,
                           ks, bs, w1s, b1s, wg, bg):
    """Entry point that composes with SPMD data parallelism.

    A pallas_call is an opaque custom call: XLA's auto-partitioner cannot
    shard it and silently falls back to all-gather + replicated execution
    (measured: output sharding collapses to P()). When an ambient mesh with
    a 'data' axis is active (jax.sharding.set_mesh — train.py/bench do this),
    the kernel is wrapped in shard_map so each device runs it on its own
    batch shard; weight gradients psum automatically through shard_map's
    transpose of replicated inputs. The dropout seed is decorrelated per
    shard by mixing in axis_index.
    """
    mesh = jax.sharding.get_abstract_mesh()
    axis = "data"
    if mesh is None or axis not in getattr(mesh, "axis_names", ()) \
            or mesh.shape[axis] <= 1 or xm.shape[0] % mesh.shape[axis] != 0:
        return fused_gated_hifi(spec, seed_f32, lens, xm, wall, ball,
                                ks, bs, w1s, b1s, wg, bg)

    from jax.sharding import PartitionSpec as P

    def per_shard(seed_s, lens_s, xm_s, wall, ball, ks, bs, w1s, b1s, wg, bg):
        bits = jax.lax.bitcast_convert_type(seed_s, jnp.int32)
        bits = bits + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(1640531527)
        seed_mixed = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return fused_gated_hifi(spec, seed_mixed, lens_s, xm_s, wall, ball,
                                ks, bs, w1s, b1s, wg, bg)

    rep = P()
    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(rep, P(axis), P(axis), rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=P(axis),
        # pallas out_shapes carry no varying-mesh-axes metadata
        check_vma=False,
    )(seed_f32, lens, xm, wall, ball, ks, bs, w1s, b1s, wg, bg)
