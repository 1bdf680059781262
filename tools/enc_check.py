"""Hardware parity check for the fused TextEncoder layer kernel.

Runs on the real TPU: the FULL TextEncoder (shipped Glow-TTS config:
C=192, 2 heads, window 4, 6 layers, filter 768, prenet) fused vs flax —
forward + parameter grads with dropout off, then the dropout-on path
(hardware PRNG: determinism per seed, seed effect, finite grads), which
no CPU test can exercise (ops/pallas/enc_layer.py has no CPU dropout
lowering). Usage: python -m tools.enc_check
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from speech_masters_thesis_tpu.models.glow_tts.encoder import TextEncoder


def _mk(B=8, T=257, n_vocab=149, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(0, n_vocab, (B, T)).astype(np.int32)
    lens = rng.randint(T // 2, T + 1, (B,)).astype(np.int32)
    lens[0] = T
    return jnp.asarray(text), jnp.asarray(lens)


def _pair(p_dropout):
    # shipped Glow-TTS encoder config (configs/models/glow_tts.yaml)
    kw = dict(n_vocab=149, out_channels=80, hidden_channels=192,
              filter_channels=768, filter_channels_dp=256, n_heads=2,
              n_layers=6, kernel_size=3, p_dropout=p_dropout, window_size=4,
              mean_only=True, prenet=True)
    return TextEncoder(fused=False, **kw), TextEncoder(fused=True, **kw)


def main():
    assert jax.default_backend() == "tpu", "run on the TPU"
    text, lens = _mk()

    # ---- dropout-off: exact-math parity fused vs flax, fwd + grads.
    # The kernel pins f32-HIGHEST dots (ops/pallas/enc_layer.py) while flax
    # on TPU defaults to bf16-class MXU matmuls (~1e-2 drift over 6 layers —
    # the r4 hardware failure was exactly this protocol bug). Compare BOTH
    # paths traced under HIGHEST precision, so the surrounding flax parts
    # (prenet, proj, duration predictor) are identical and only kernel-vs-XLA
    # rounding remains; report the default-precision drift for scale.
    ref, fus = _pair(0.0)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, text, lens, train=False)

    with jax.default_matmul_precision("highest"):
        o_ref = jax.jit(lambda v: ref.apply(v, text, lens, train=False))(variables)
        o_fus = jax.jit(lambda v: fus.apply(v, text, lens, train=False))(variables)
    o_def = jax.jit(lambda v: ref.apply(v, text, lens, train=False))(variables)
    m = np.asarray(o_ref[3])
    for name, a, b, d, mm in (("x_m", o_ref[0], o_fus[0], o_def[0], m),
                              ("logw", o_ref[2], o_fus[2], o_def[2], m[..., 0])):
        err = float(np.abs((np.asarray(a) - np.asarray(b)) * mm).max())
        err_def = float(np.abs((np.asarray(a) - np.asarray(d)) * mm).max())
        print(f"fwd {name}: max err (valid) fused={err:.3e} "
              f"(default-precision flax={err_def:.3e})")
        assert err < 5e-4, f"{name} forward mismatch"

    def loss(block):
        def f(v):
            x_m, x_logs, logw, mask = block.apply(
                v, text, lens, train=True,
                rngs={"dropout": jax.random.PRNGKey(7)})
            return (jnp.sum((x_m * mask) ** 2)
                    + jnp.sum((logw * mask[..., 0]) ** 2))
        return f

    with jax.default_matmul_precision("highest"):
        g_ref = jax.jit(jax.grad(loss(ref)))(variables)
        g_fus = jax.jit(jax.grad(loss(fus)))(variables)
    leaves_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    leaves_fus = jax.tree_util.tree_flatten_with_path(g_fus)[0]
    # Floor each leaf's denominator at 3e-4 of the GLOBAL gradient scale:
    # some leaves' true gradients are mathematically ZERO (conv_k.bias — the
    # softmax is invariant to a constant shift of every key logit, so both
    # paths compute pure rounding noise there; r5 hardware run failed on
    # exactly that leaf at 3.18e-3 "relative" error, noise over noise).
    gscale = max(float(np.abs(np.asarray(a)).max()) for _, a in leaves_ref)
    worst = 0.0
    for (pa, a), (_, b) in zip(leaves_ref, leaves_fus):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 3e-4 * gscale, 1e-2)
        rel = np.abs(a - b).max() / scale
        worst = max(worst, rel)
        assert rel < 2e-3, f"grad mismatch at {jax.tree_util.keystr(pa)}: {rel:.3e}"
    print(f"grads: worst scaled err = {worst:.3e} over "
          f"{len(jax.tree_util.tree_leaves(g_ref))} leaves")

    # ---- dropout-on (TPU hardware PRNG): determinism / seed effect / grads
    _, fus_d = _pair(0.1)
    f = jax.jit(lambda v, key: fus_d.apply(v, text, lens, train=True,
                                           rngs={"dropout": key})[0])
    k1, k2 = jax.random.PRNGKey(11), jax.random.PRNGKey(12)
    o1, o2 = f(variables, k1), f(variables, k1)
    assert bool(jnp.array_equal(o1, o2)), "dropout not deterministic per seed"
    o3 = f(variables, k2)
    assert not bool(jnp.array_equal(o1, o3)), "seed has no effect"
    gd = jax.jit(jax.grad(lambda v: (f(v, k1) ** 2).sum()))(variables)
    flat = jnp.concatenate([jnp.ravel(g) for g in jax.tree_util.tree_leaves(gd)])
    assert bool(jnp.isfinite(flat).all()) and float(jnp.abs(flat).max()) > 0
    print("dropout determinism/seed/grad: OK")

    # ---- quick timing: fused vs flax encoder forward+backward, train mode
    for tag, enc in (("flax ", ref), ("fused", fus)):
        g = jax.jit(jax.grad(loss(enc)))
        jax.block_until_ready(g(variables))  # compile
        t0 = time.perf_counter()
        for _ in range(20):
            out = g(variables)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20
        print(f"{tag} encoder fwd+bwd (B=8, T=257): {dt * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
