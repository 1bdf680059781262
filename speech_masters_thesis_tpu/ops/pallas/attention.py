"""Fused small-T causal attention as Pallas TPU kernels (fwd + recompute bwd).

Why this kernel exists: at the reference LM scale (T=257, d_head 32,
reference models/transformer_lm/transformer_lm.py:55-65) the XLA attention
path materializes the [B, H, T, T] logits, probs AND a u32 dropout-bits
tensor in HBM every layer; the device trace of the bf16 train step showed
~37% of device time in those tensors' HBM round trips (layout copies,
rng-bit copies, softmax loop fusions). The stock Pallas flash kernel loses
here too — 2.8x slower than XLA (BASELINE.md): its online-softmax K-loop
is overhead when the WHOLE [T, T] score matrix fits VMEM comfortably.

Design: ONE grid step per batch element; all H heads loop inside the
kernel (unrolled). A first cut used a (B, H) grid — one head per program —
and LOST to XLA (13.6 vs 11.3 ms): 128 tiny programs per layer drown in
per-grid-step overhead. With the head loop the grid is (B,) and each
program does H * (2 matmuls + softmax) on VMEM-resident data:

    S_h = (Q_h K_h^T) * scale  -> causal+length mask -> softmax (f32)
    P_h -> dropout (on-chip PRNG) -> O_h = P_h V_h

  * HBM traffic collapses to: read Q, K, V once, write O once, all in the
    model's natural [B, T, H*D] layout (a free reshape from [B, T, H, D] —
    no transposes). Logits/probs/dropout bits never exist in HBM.
  * T pads only to the sublane quantum (8), not to 128: the [Tp, Tp]
    score tile is physically lane-padded either way, but fewer rows mean
    ~30% less VPU work at T=257 than a 128-aligned variant.
  * The backward saves NOTHING: it recomputes S and P in-tile and
    regenerates the identical dropout mask from the seed (hardware PRNG,
    seeded per (batch, head) — same forward/backward agreement contract as
    gated_hifi.py).

Semantics vs the unfused path (models/transformer_lm/model.py:_attend):
  * identical math at valid positions (additive -1e9 masking == where-mask
    here); invalid query rows (t >= length) attend over the valid causal
    prefix and produce harmless values the loss mask discards.
  * dropout is distributionally identical (Bernoulli keep * 1/(1-p)) but
    uses the TPU hardware PRNG, so the mask realization differs from the
    flax path for the same key — the same documented deviation as the
    fused GatedHiFi / WN-coupling kernels.

Limits: VMEM wants ~2 * Tp^2 * 4B (score + probs) plus 4 * Tp * H*D * 2B
streams; intended for T <= ~1024 at H*D = 512. Beyond that, use the stock
flash path (O(T) memory).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


@dataclass(frozen=True)
class SmallTAttnSpec:
    """Static configuration (hashable; nondiff custom_vjp arg)."""

    n_heads: int
    d_head: int
    scale: float
    p_drop: float = 0.0
    interpret: bool = False


def _mix(seed, *vals):
    """Integer hash mixing for per-(batch, head) dropout seeds (wraps)."""
    h = seed
    for v in vals:
        h = h * jnp.int32(1000003) + jnp.int32(v)
    return h


def _row_clean(x, bound):
    """Zero rows >= bound. Pallas fills out-of-bounds block rows with
    GARBAGE (possibly NaN); 0 * NaN = NaN would poison every matmul that
    contracts over rows, so garbage must be overwritten, not multiplied."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < bound, x, jnp.zeros_like(x))


def _dot_prec(dtype):
    """f32 Pallas dots lower to a single bf16 MXU pass unless HIGHEST is
    pinned (same workaround as wn_coupling.py); bf16 keeps the fast path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _probs(spec, q, k, len_b, tp):
    """S -> masked softmax (f32). q/k: [Tp, D] (garbage rows pre-zeroed)."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=_dot_prec(q.dtype),
        preferred_element_type=jnp.float32) * spec.scale
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    valid = (col <= row) & (col < len_b)
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _keep_mask(spec, seed, b, h, tp):
    """Regenerable dropout keep-mask * 1/(1-p), f32 [Tp, Tp]."""
    pltpu.prng_seed(_mix(seed, b, h))
    bits = pltpu.bitcast(pltpu.prng_random_bits((tp, tp)), jnp.uint32)
    threshold = jnp.uint32(int(spec.p_drop * (2 ** 32)))
    return (bits >= threshold).astype(jnp.float32) / (1.0 - spec.p_drop)


def _fwd_kernel(spec: SmallTAttnSpec, T: int, seed_ref, len_ref,
                q_ref, k_ref, v_ref, o_ref):
    b = pl.program_id(0)
    tp = q_ref.shape[1]
    D = spec.d_head
    len_b = len_ref[b]
    qall = _row_clean(q_ref[0], T)          # [Tp, H*D]
    kall = _row_clean(k_ref[0], T)
    vall = _row_clean(v_ref[0], len_b)      # masked keys never reach O

    outs = []
    for h in range(spec.n_heads):
        sl = slice(h * D, (h + 1) * D)
        p = _probs(spec, qall[:, sl], kall[:, sl], len_b, tp)
        if spec.p_drop > 0.0:
            p = p * _keep_mask(spec, seed_ref[0], b, h, tp)
        outs.append(jax.lax.dot_general(
            p.astype(qall.dtype), vall[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_dot_prec(qall.dtype),
            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _bwd_kernel(spec: SmallTAttnSpec, T: int, seed_ref, len_ref,
                q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
    b = pl.program_id(0)
    tp = q_ref.shape[1]
    D = spec.d_head
    len_b = len_ref[b]
    qall = _row_clean(q_ref[0], T)
    kall = _row_clean(k_ref[0], T)
    vall = _row_clean(v_ref[0], len_b)
    gall = _row_clean(g_ref[0], T)
    dot_dtype = qall.dtype
    prec = _dot_prec(dot_dtype)

    dqs, dks, dvs = [], [], []
    for h in range(spec.n_heads):
        sl = slice(h * D, (h + 1) * D)
        q, k, v, g = qall[:, sl], kall[:, sl], vall[:, sl], gall[:, sl]
        p = _probs(spec, q, k, len_b, tp)
        if spec.p_drop > 0.0:
            keep = _keep_mask(spec, seed_ref[0], b, h, tp)
            pd = p * keep
        else:
            keep = None
            pd = p

        # dV = P_drop^T g
        dvs.append(jax.lax.dot_general(
            pd.astype(dot_dtype), g, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32))
        # dP_drop = g V^T
        dpd = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        dp = dpd * keep if keep is not None else dpd
        # softmax vjp (invalid cols have p == 0, so ds vanishes there)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * spec.scale).astype(dot_dtype)
        dqs.append(jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32))

    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)


def _cost(spec: SmallTAttnSpec, B, tp, bwd: bool,
          itemsize: int = 2) -> pl.CostEstimate:
    """Analytic FLOPs so XLA cost analysis counts the opaque kernel
    (same convention as gated_hifi.py:_block_flops)."""
    matmuls = 5 + 2 if bwd else 2          # bwd: 5 grads + 2 recompute
    flops = B * spec.n_heads * matmuls * 2 * tp * tp * spec.d_head
    trans = B * spec.n_heads * tp * tp * (2 if bwd else 1)
    bytes_accessed = B * tp * spec.n_heads * spec.d_head * itemsize * (7 if bwd else 4)
    return pl.CostEstimate(flops=flops, transcendentals=trans,
                           bytes_accessed=bytes_accessed)


def _batch_spec(tp: int, hd: int):
    """One batch element of a [B, T, H*D] array per grid step (Tp % 8 == 0,
    H*D % 128 == 0 satisfy Mosaic's block-shape constraints)."""
    return pl.BlockSpec((1, tp, hd), lambda b, *_: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _pad_t(t: int) -> int:
    return -(-t // 8) * 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_attention(spec: SmallTAttnSpec, seed_f32, lens_f32, q, k, v):
    """o[b,t,h,:] = sum_s softmax_s(q k^T * scale + causal/len mask) v.

    q/k/v: [B, T, H, D] (bf16 or f32); lens_f32: [B] float32 holding int32
    key-length bit patterns; seed_f32: float32 scalar holding the int32
    dropout seed bit pattern (floats so custom_vjp cotangent plumbing stays
    all-float, as in gated_hifi.py).
    """
    B, T, H, D = q.shape
    assert H == spec.n_heads and D == spec.d_head
    hd = H * D
    tp = _pad_t(T)
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    lens = jax.lax.bitcast_convert_type(lens_f32, jnp.int32).reshape((B,))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[_batch_spec(tp, hd)] * 3,
            out_specs=_batch_spec(tp, hd),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, hd), q.dtype),
        cost_estimate=_cost(spec, B, tp, bwd=False, itemsize=q.dtype.itemsize),
        interpret=spec.interpret,
    )(seed, lens, q.reshape(B, T, hd), k.reshape(B, T, hd), v.reshape(B, T, hd))
    return out.reshape(B, T, H, D)


def _vjp_fwd(spec, seed_f32, lens_f32, q, k, v):
    out = fused_attention(spec, seed_f32, lens_f32, q, k, v)
    return out, (seed_f32, lens_f32, q, k, v)


def _vjp_bwd(spec, residuals, g):
    seed_f32, lens_f32, q, k, v = residuals
    B, T, H, D = q.shape
    hd = H * D
    tp = _pad_t(T)
    seed = jax.lax.bitcast_convert_type(seed_f32, jnp.int32).reshape((1,))
    lens = jax.lax.bitcast_convert_type(lens_f32, jnp.int32).reshape((B,))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[_batch_spec(tp, hd)] * 4,
            out_specs=[_batch_spec(tp, hd)] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct((B, T, hd), q.dtype)] * 3,
        cost_estimate=_cost(spec, B, tp, bwd=True, itemsize=q.dtype.itemsize),
        interpret=spec.interpret,
    )(seed, lens, q.reshape(B, T, hd), k.reshape(B, T, hd),
      v.reshape(B, T, hd), g.astype(q.dtype).reshape(B, T, hd))
    return (jnp.zeros_like(seed_f32), jnp.zeros_like(lens_f32),
            dq.reshape(B, T, H, D), dk.reshape(B, T, H, D),
            dv.reshape(B, T, H, D))


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def apply_fused_attention(spec: SmallTAttnSpec, seed_f32, lengths, q, k, v):
    """SPMD-composable entry point (mirrors apply_fused_gated_hifi).

    ``lengths``: [B] int32 valid key lengths. When an ambient mesh with a
    'data' axis is active, wraps the opaque pallas_call in shard_map over
    the batch axis (XLA cannot auto-partition a custom call) and
    decorrelates the dropout seed per shard.
    """
    lens_f32 = jax.lax.bitcast_convert_type(lengths.astype(jnp.int32), jnp.float32)
    mesh = jax.sharding.get_abstract_mesh()
    axis = "data"
    if mesh is None or axis not in getattr(mesh, "axis_names", ()) \
            or mesh.shape[axis] <= 1 or q.shape[0] % mesh.shape[axis] != 0:
        return fused_attention(spec, seed_f32, lens_f32, q, k, v)

    from jax.sharding import PartitionSpec as P

    def per_shard(seed_s, lens_s, q_s, k_s, v_s):
        bits = jax.lax.bitcast_convert_type(seed_s, jnp.int32)
        bits = bits + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(1640531527)
        seed_mixed = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return fused_attention(spec, seed_mixed, lens_s, q_s, k_s, v_s)

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(seed_f32, lens_f32, q, k, v)
