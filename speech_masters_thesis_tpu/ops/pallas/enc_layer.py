"""Fused transformer encoder layer as Pallas TPU kernels.

Serves BOTH the Glow-TTS/VQ-TTS TextEncoder (windowed relative attention,
k=3 conv FFN) and the Transformer LM's torch-parity encoder layer
(causal attention, k=1 Dense FFN) — see EncLayerSpec.

Why this kernel exists: after the flow-step fusion, the largest remaining
op-count region of the Glow-TTS train step is the 6-layer TextEncoder
(HLO attribution: ~11k instructions of tiny [B, T<=257, 192] tensors —
attention score/prob round trips, the relative-position skew pad/reshape
chain, LayerNorms, FFN convs and four dropout sites per layer). Like the
WN-coupling conditioner this region is wall-clock-bound by op dispatch and
HBM round trips of small tensors, not FLOPs.

This kernel computes ONE WHOLE ENCODER LAYER per batch element in VMEM:

    xm = x * mask
    q, k, v = 1x1 projections                     (reference conv_q/k/v)
    per head: scores = (q k^T + band(q R_k^T)) / sqrt(d)
              -> mask (-1e4) -> softmax (f32) -> dropout
              o = p v + band_weights(p) R_v
    y  = conv_o(concat o) -> dropout
    x1 = LayerNorm(xm + y)                        (reference norm1_i)
    f  = conv2(drop(relu(conv1(x1 * mask))) * mask) * mask -> dropout
    out = LayerNorm(x1 + f)                       (reference norm2_i)

matching the reference AttentionBlock + FFN + LayerNorm stack
(/root/reference/models/glow_tts/submodules.py:403-599, modules.py:95-131;
flax path models/glow_tts/attention.py + encoder.py).

Design notes:
  * The sequences are short (text T <= ~300), so a whole layer per batch
    element fits VMEM: grid (B,), no tiles, no halos. HBM traffic per layer
    collapses to read x + write out (+ the layer's weights, which Pallas
    keeps resident across grid steps).
  * The relative-position window (|offset| <= w, reference
    submodules.py:484-554) is NOT computed via the pad/reshape skew trick:
    the padded table is zero outside the window, so the skew is a 2w+1-
    diagonal band. The kernel computes C = q R_k^T ([T, 2w+1], one small
    matmul) and scatters/extracts diagonals with offset-iota selects —
    pure VPU work, no reshapes (Mosaic-hostile) and no [T, 2T-1] tensors.
  * Backward saves NOTHING: full in-VMEM recompute, dropout masks
    regenerated from the on-chip PRNG seeded per (batch, site, head) —
    the same contract as gated_hifi.py / wn_coupling.py.
  * Invalid rows (t >= length) produce harmless values that downstream
    masking discards; the softmax over a fully-masked row is uniform over
    the PADDED width (tp vs the flax path's T) — a documented deviation at
    positions the model defines as garbage. Valid positions match the flax
    path to accumulation-order tolerance.
  * Dropout is distributionally identical to the flax path (Bernoulli
    keep * 1/(1-p)) but uses the TPU hardware PRNG, so realizations differ
    for the same key — the same documented deviation as the other fused
    kernels. No CPU lowering exists: train-mode with p>0 falls back to the
    flax path off-TPU (the caller handles this).

Gating (caller: models/glow_tts/encoder.py TextEncoder): self-attention
with window_size set, heads_share=True, no block_length/proximal_bias/
speaker conditioning — exactly the configuration every shipped encoder
uses (configs/models/glow_tts.yaml, vqtts.yaml).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_MASK = -1e4  # reference masked_fill(-1e4) (submodules.py:478)

# dropout sites within one layer (seed mixing ids)
_SITE_ATTN_P = 0   # attention probabilities (per head)
_SITE_ATTN_Y = 1   # post-attention residual branch
_SITE_FFN_MID = 2  # post-relu inside the FFN
_SITE_FFN_Y = 3    # post-FFN residual branch


@dataclass(frozen=True)
class EncLayerSpec:
    """Static configuration of one fused encoder layer.

    Two instantiations share this kernel:
      * Glow/VQ-TTS TextEncoder layer: window=w (relative tables), k=3
        conv FFN, bidirectional length masking, eps=1e-4.
      * Transformer-LM layer (torch nn.TransformerEncoderLayer parity,
        models/transformer_lm/model.py): window=None (no tables),
        causal=True, k=1 Dense FFN, eps=1e-5.
    """

    channels: int          # C (hidden_channels)
    n_heads: int
    window: int | None     # relative-attention window w (None: no tables)
    filter_channels: int   # FFN hidden width
    kernel_size: int       # FFN conv kernel (odd; 1 = Dense)
    p_drop: float = 0.0
    eps: float = 1e-4      # LayerNorm epsilon
    causal: bool = False   # causal masking (LM) vs bidirectional (TTS)
    interpret: bool = False

    @property
    def d_head(self) -> int:
        return self.channels // self.n_heads

    @property
    def rel_width(self) -> int:
        return 2 * self.window + 1

    @property
    def param_names(self) -> tuple:
        names = ["wq", "bq", "wk", "bk", "wv", "bv"]
        if self.window is not None:
            names += ["rk", "rv"]
        return tuple(names + ["wo", "bo", "g1", "be1",
                              "w1", "b1", "w2", "b2", "g2", "be2"])


def _mix(seed, *vals):
    h = seed
    for v in vals:
        h = h * jnp.int32(1000003) + jnp.int32(v)
    return h


def _prec(dd):
    """f32 Pallas dots lower to a single bf16 MXU pass unless HIGHEST is
    pinned (same workaround as wn_coupling.py)."""
    return jax.lax.Precision.HIGHEST if dd == jnp.float32 else None


def _dot_nn(a, b, dd):
    """[M, K] x [K, N] -> [M, N] f32."""
    return jax.lax.dot_general(a.astype(dd), b.astype(dd),
                               (((1,), (0,)), ((), ())), precision=_prec(dd),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b, dd):
    """[M, K] x [N, K] -> [M, N] f32 (contract last with last)."""
    return jax.lax.dot_general(a.astype(dd), b.astype(dd),
                               (((1,), (1,)), ((), ())), precision=_prec(dd),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b, dd):
    """[K, M] x [K, N] -> [M, N] f32 (contract first with first)."""
    return jax.lax.dot_general(a.astype(dd), b.astype(dd),
                               (((0,), (0,)), ((), ())), precision=_prec(dd),
                               preferred_element_type=jnp.float32)


def _keep_mask(spec: EncLayerSpec, seed, b, site, h, shape):
    """Regenerable dropout keep-mask * 1/(1-p) (hardware PRNG)."""
    pltpu.prng_seed(_mix(seed, b, site, h))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(int(spec.p_drop * (2 ** 32)))
    scale = jnp.float32(1.0 / (1.0 - spec.p_drop))
    return (bits >= threshold).astype(jnp.float32) * scale


def _zeros_pad(x, pad: int):
    if pad == 0:
        return x
    z = jnp.zeros((pad, x.shape[1]), x.dtype)
    return jnp.concatenate([z, x, z], axis=0)


def _conv(x, kernel, bias, k: int, dd):
    """Full-sequence SAME conv: x [T, C] -> [T, F] f32 (taps as matmuls)."""
    T = x.shape[0]
    pad = (k - 1) // 2
    xp = _zeros_pad(x, pad)
    out = jnp.broadcast_to(bias.astype(jnp.float32), (T, kernel.shape[-1]))
    for j in range(k):
        out = out + _dot_nn(xp[j:j + T], kernel[j], dd)
    return out


def _conv_t(dc, kernel, k: int, dd):
    """Transpose of _conv w.r.t. x: dc [T, F] -> dx [T, C] f32."""
    T = dc.shape[0]
    pad = (k - 1) // 2
    dcp = _zeros_pad(dc, pad)
    dx = jnp.zeros((T, kernel.shape[1]), jnp.float32)
    for j in range(k):
        dx = dx + _dot_nt(dcp[(k - 1 - j):(k - 1 - j) + T], kernel[j], dd)
    return dx


def _conv_wgrad(xm, dc, k: int, dd):
    """Weight grad of _conv: ([T, C] input, [T, F] cotangent) -> [k, C, F]."""
    T = xm.shape[0]
    pad = (k - 1) // 2
    xp = _zeros_pad(xm, pad)
    return jnp.stack([_dot_tn(xp[j:j + T], dc, dd) for j in range(k)], axis=0)


def _ln_fwd(z, gamma, beta, eps):
    """Flax-LayerNorm-compatible forward (f32). Returns (out, zhat, inv)."""
    mu = jnp.mean(z, axis=-1, keepdims=True)
    # use_fast_variance=True semantics: E[x^2] - E[x]^2
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    zhat = (z - mu) * inv
    return zhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32), zhat, inv


def _ln_bwd(dout, zhat, inv, gamma):
    """Backward of _ln_fwd. Returns (dz, dgamma [1, C], dbeta [1, C])."""
    dg = jnp.sum(dout * zhat, axis=0, keepdims=True)
    db = jnp.sum(dout, axis=0, keepdims=True)
    dy = dout * gamma.astype(jnp.float32)
    dz = inv * (dy - jnp.mean(dy, axis=-1, keepdims=True)
                - zhat * jnp.mean(dy * zhat, axis=-1, keepdims=True))
    return dz, dg, db


def _band_scatter(vals, off, w: int):
    """vals [T, R] -> [T, T]: out[i, j] = vals[i, j - i + w] inside the band."""
    out = jnp.zeros(off.shape, jnp.float32)
    for o in range(2 * w + 1):
        out = out + jnp.where(off == (o - w), vals[:, o:o + 1], 0.0)
    return out


def _band_extract(mat, off, w: int):
    """mat [T, T] -> [T, R]: out[i, o] = mat[i, i + o - w] (0 off-band)."""
    cols = [jnp.sum(jnp.where(off == (o - w), mat, 0.0), axis=1, keepdims=True)
            for o in range(2 * w + 1)]
    return jnp.concatenate(cols, axis=1)


def _layer_fwd_body(spec: EncLayerSpec, dd, seed, b, len_b, x_raw, p_):
    """Forward math for one batch element. p_ is the params dict; returns
    (out [T, C] f32, saves dict for the backward)."""
    C, H, D, w = spec.channels, spec.n_heads, spec.d_head, spec.window
    tp = x_raw.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    row_ok = rows < len_b
    validf = row_ok.astype(jnp.float32)
    # one where handles both sequence masking and Pallas garbage rows
    xm = jnp.where(row_ok, x_raw.astype(jnp.float32), 0.0)

    q = _dot_nn(xm, p_["wq"], dd) + p_["bq"].astype(jnp.float32)
    k = _dot_nn(xm, p_["wk"], dd) + p_["bk"].astype(jnp.float32)
    v = _dot_nn(xm, p_["wv"], dd) + p_["bv"].astype(jnp.float32)

    row2 = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    off = col2 - row2
    if spec.causal:
        # LM masking: every query row attends its valid causal prefix
        # (invalid rows produce garbage the loss mask discards)
        smask = (col2 <= row2) & (col2 < len_b)
    else:
        smask = (col2 < len_b) & (row2 < len_b)
    inv_sqrt = 1.0 / (float(D) ** 0.5)

    saves = {"xm": xm, "q": q, "k": k, "v": v, "validf": validf, "off": off,
             "smask": smask}
    heads = []
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = _dot_nt(qh, kh, dd)
        if w is not None:
            clog = _dot_nt(qh, p_["rk"], dd)          # [T, 2w+1]
            s = s + _band_scatter(clog, off, w)
        s = s * inv_sqrt
        s = jnp.where(smask, s, NEG_MASK)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        saves[f"p{h}"] = p
        pd = p * _keep_mask(spec, seed, b, _SITE_ATTN_P, h, p.shape) \
            if spec.p_drop > 0.0 else p
        oh = _dot_nn(pd, vh, dd)
        if w is not None:
            wm = _band_extract(pd, off, w)            # [T, 2w+1]
            oh = oh + _dot_nn(wm, p_["rv"], dd)
        heads.append(oh)
    att = jnp.concatenate(heads, axis=1)              # [T, C]
    saves["att"] = att
    y = _dot_nn(att, p_["wo"], dd) + p_["bo"].astype(jnp.float32)
    if spec.p_drop > 0.0:
        y = y * _keep_mask(spec, seed, b, _SITE_ATTN_Y, 0, y.shape)
    z1 = xm + y
    x1, zhat1, inv1 = _ln_fwd(z1, p_["g1"], p_["be1"], spec.eps)
    saves.update(x1=x1, zhat1=zhat1, inv1=inv1)

    x1m = x1 * validf
    c1 = _conv(x1m, p_["w1"], p_["b1"], spec.kernel_size, dd)
    a1 = jnp.maximum(c1, 0.0)
    saves["c1"] = c1
    d1 = a1 * _keep_mask(spec, seed, b, _SITE_FFN_MID, 0, a1.shape) \
        if spec.p_drop > 0.0 else a1
    saves["d1m"] = d1 * validf
    c2 = _conv(saves["d1m"], p_["w2"], p_["b2"], spec.kernel_size, dd)
    y2 = c2 * validf
    if spec.p_drop > 0.0:
        y2 = y2 * _keep_mask(spec, seed, b, _SITE_FFN_Y, 0, y2.shape)
    z2 = x1 + y2
    out, zhat2, inv2 = _ln_fwd(z2, p_["g2"], p_["be2"], spec.eps)
    saves.update(zhat2=zhat2, inv2=inv2)
    return out, saves


def _fwd_kernel(spec: EncLayerSpec, dd, seed_ref, lens_ref, x_ref, *refs):
    p_ = {n: r[...] for n, r in zip(spec.param_names, refs[:-1])}
    out_ref = refs[-1]
    b = pl.program_id(0)
    out, _ = _layer_fwd_body(spec, dd, seed_ref[0], b, lens_ref[b], x_ref[0], p_)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(spec: EncLayerSpec, dd, seed_ref, lens_ref, x_ref, g_ref,
                *refs):
    C, H, D, w, k = (spec.channels, spec.n_heads, spec.d_head, spec.window,
                     spec.kernel_size)
    names = spec.param_names
    p_ = {n: r[...] for n, r in zip(names, refs[:len(names)])}
    dx_ref = refs[len(names)]
    acc_refs = {n: r for n, r in zip(names, refs[len(names) + 1:])}
    b = pl.program_id(0)
    seed = seed_ref[0]
    len_b = lens_ref[b]

    # ---- recompute forward ----
    _, sv = _layer_fwd_body(spec, dd, seed, b, len_b, x_ref[0], p_)
    xm, q, kk, v = sv["xm"], sv["q"], sv["k"], sv["v"]
    validf, off, smask = sv["validf"], sv["off"], sv["smask"]
    inv_sqrt = 1.0 / (float(D) ** 0.5)

    rows = jax.lax.broadcasted_iota(jnp.int32, (xm.shape[0], 1), 0)
    g = jnp.where(rows < len_b, g_ref[0].astype(jnp.float32), 0.0)

    acc = {}
    # ---- LN2 / FFN ----
    dz2, acc["g2"], acc["be2"] = _ln_bwd(g, sv["zhat2"], sv["inv2"], p_["g2"])
    dx1 = dz2
    dy2 = dz2 * _keep_mask(spec, seed, b, _SITE_FFN_Y, 0, dz2.shape) \
        if spec.p_drop > 0.0 else dz2
    dc2 = dy2 * validf
    acc["w2"] = _conv_wgrad(sv["d1m"], dc2, k, dd)
    acc["b2"] = jnp.sum(dc2, axis=0, keepdims=True)
    dd1 = _conv_t(dc2, p_["w2"], k, dd) * validf
    da1 = dd1 * _keep_mask(spec, seed, b, _SITE_FFN_MID, 0, dd1.shape) \
        if spec.p_drop > 0.0 else dd1
    dc1 = da1 * (sv["c1"] > 0.0).astype(jnp.float32)
    x1m = sv["x1"] * validf
    acc["w1"] = _conv_wgrad(x1m, dc1, k, dd)
    acc["b1"] = jnp.sum(dc1, axis=0, keepdims=True)
    dx1 = dx1 + _conv_t(dc1, p_["w1"], k, dd) * validf

    # ---- LN1 / attention ----
    dz1, acc["g1"], acc["be1"] = _ln_bwd(dx1, sv["zhat1"], sv["inv1"], p_["g1"])
    dxm = dz1
    dy = dz1 * _keep_mask(spec, seed, b, _SITE_ATTN_Y, 0, dz1.shape) \
        if spec.p_drop > 0.0 else dz1
    acc["wo"] = _dot_tn(sv["att"], dy, dd)
    acc["bo"] = jnp.sum(dy, axis=0, keepdims=True)
    datt = _dot_nt(dy, p_["wo"], dd)

    dqs, dks, dvs = [], [], []
    if w is not None:
        drk = jnp.zeros_like(p_["rk"], dtype=jnp.float32)
        drv = jnp.zeros_like(p_["rv"], dtype=jnp.float32)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh = q[:, sl], kk[:, sl], v[:, sl]
        p = sv[f"p{h}"]
        keep = _keep_mask(spec, seed, b, _SITE_ATTN_P, h, p.shape) \
            if spec.p_drop > 0.0 else None
        pd = p * keep if keep is not None else p
        doh = datt[:, sl]
        dpd = _dot_nt(doh, vh, dd)
        dvs.append(_dot_tn(pd, doh, dd))
        if w is not None:
            wm = _band_extract(pd, off, w)
            dwm = _dot_nt(doh, p_["rv"], dd)          # [T, 2w+1]
            drv = drv + _dot_tn(wm, doh, dd)
            dpd = dpd + _band_scatter(dwm, off, w)
        dp = dpd * keep if keep is not None else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = jnp.where(smask, ds, 0.0) * inv_sqrt
        dq_h = _dot_nn(ds, kh, dd)
        if w is not None:
            dclog = _band_extract(ds, off, w)         # [T, 2w+1]
            dq_h = dq_h + _dot_nn(dclog, p_["rk"], dd)
            drk = drk + _dot_tn(dclog, qh, dd)
        dqs.append(dq_h)
        dks.append(_dot_tn(ds, qh, dd))
    if w is not None:
        acc["rk"], acc["rv"] = drk, drv
    dq = jnp.concatenate(dqs, axis=1)
    dk = jnp.concatenate(dks, axis=1)
    dv = jnp.concatenate(dvs, axis=1)

    acc["wq"] = _dot_tn(xm, dq, dd)
    acc["bq"] = jnp.sum(dq, axis=0, keepdims=True)
    acc["wk"] = _dot_tn(xm, dk, dd)
    acc["bk"] = jnp.sum(dk, axis=0, keepdims=True)
    acc["wv"] = _dot_tn(xm, dv, dd)
    acc["bv"] = jnp.sum(dv, axis=0, keepdims=True)
    dxm = dxm + _dot_nt(dq, p_["wq"], dd) + _dot_nt(dk, p_["wk"], dd) \
        + _dot_nt(dv, p_["wv"], dd)
    dx_ref[0] = (dxm * validf).astype(dx_ref.dtype)

    first = b == 0

    @pl.when(first)
    def _():
        for n, r in acc_refs.items():
            r[...] = acc[n]

    @pl.when(jnp.logical_not(first))
    def _():
        for n, r in acc_refs.items():
            r[...] = r[...] + acc[n]


def _flops(spec: EncLayerSpec, B: int, T: int, bwd: bool) -> pl.CostEstimate:
    """Analytic cost (pallas calls are opaque to XLA's FLOP counting)."""
    C, H, D, F, k = (spec.channels, spec.n_heads, spec.d_head,
                     spec.filter_channels, spec.kernel_size)
    per = 4 * 2 * T * C * C                       # q/k/v/o projections
    per += H * 2 * (2 * T * T * D)                # scores + probs@V
    if spec.window is not None:
        per += H * 2 * (2 * T * spec.rel_width * D)
    per += 2 * (2 * k * T * C * F)                # FFN convs
    flops = B * per
    trans = B * H * T * T                         # softmax exp
    if bwd:
        flops *= 3
        trans *= 2
    bytes_accessed = B * T * C * 2 * (3 if bwd else 2)
    return pl.CostEstimate(flops=flops, transcendentals=trans,
                           bytes_accessed=bytes_accessed)


def _row_spec(T: int, C: int):
    return pl.BlockSpec((1, T, C), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _weight_specs(n: int):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


# The recompute backward holds the weights, the f32 param-grad accumulators,
# and the T x filter_channels intermediates in VMEM at once — near Mosaic's
# default 16 MB scoped budget at the shipped scale (T=257, C=192, F=768).
# v5e has 128 MB VMEM/core; raise the cap for the backward kernel (same fix
# as ops/pallas/wn_coupling.py's r4 hardware OOM).
_BWD_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_enc_layer(spec: EncLayerSpec, seed_f32, lens, x, *params):
    """One fused encoder layer; params in spec.param_names order:
    wq/bq/wk/bk/wv/bv [C,C]/[1,C], rk/rv [2w+1, D] (windowed specs only),
    wo/bo, g1/be1 (LN1), w1/b1 [k,C,F]/[1,F], w2/b2 [k,F,C]/[1,C],
    g2/be2 (LN2).
    seed_f32: f32 scalar carrying int32 dropout-seed bits; lens: [B] int32.
    """
    B, T, C = x.shape
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec, x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[_row_spec(T, C)] + _weight_specs(len(spec.param_names)),
            out_specs=_row_spec(T, C),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        cost_estimate=_flops(spec, B, T, bwd=False),
        interpret=spec.interpret,
    )(seed, lens, x, *params)


def _vjp_fwd(spec, seed_f32, lens, x, *params):
    out = fused_enc_layer(spec, seed_f32, lens, x, *params)
    return out, (seed_f32, lens, x, params)


def _vjp_bwd(spec, residuals, g):
    seed_f32, lens, x, params = residuals
    B, T, C = x.shape
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    f32 = jnp.float32
    acc = lambda shape: pl.BlockSpec(shape, lambda b, *_: tuple(0 for _ in shape),
                                     memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[_row_spec(T, C)] * 2 + _weight_specs(len(spec.param_names)),
            out_specs=(_row_spec(T, C),
                       *[acc(p.shape) for p in params]),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), x.dtype),
                   *[jax.ShapeDtypeStruct(p.shape, f32) for p in params]),
        cost_estimate=_flops(spec, B, T, bwd=True),
        compiler_params=_BWD_COMPILER_PARAMS,
        interpret=spec.interpret,
    )(seed, lens, x, g.astype(x.dtype), *params)
    dx = outs[0]
    dparams = tuple(d.astype(p.dtype) for d, p in zip(outs[1:], params))
    return (jnp.zeros_like(seed_f32), jnp.zeros_like(lens), dx) + dparams


fused_enc_layer.defvjp(_vjp_fwd, _vjp_bwd)


def apply_fused_enc_layer(spec: EncLayerSpec, seed_f32, lens, x, *params):
    """SPMD-composing entry point (same pattern as the other fused kernels):
    shard_map over the ambient 'data' mesh so the opaque custom call is
    partitioned instead of silently all-gathered + replicated."""
    mesh = jax.sharding.get_abstract_mesh()
    axis = "data"
    if mesh is None or axis not in getattr(mesh, "axis_names", ()) \
            or mesh.shape[axis] <= 1 or x.shape[0] % mesh.shape[axis] != 0:
        return fused_enc_layer(spec, seed_f32, lens, x, *params)

    from jax.sharding import PartitionSpec as P

    def per_shard(seed_s, lens_s, x_s, *ps):
        bits = jax.lax.bitcast_convert_type(seed_s, jnp.int32)
        bits = bits + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(1640531527)
        seed_mixed = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return fused_enc_layer(spec, seed_mixed, lens_s, x_s, *ps)

    rep = P()
    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(rep, P(axis), P(axis)) + tuple(rep for _ in params),
        out_specs=P(axis),
        check_vma=False,
    )(seed_f32, lens, x, *params)
