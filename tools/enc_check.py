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

    # ---- dropout-off: exact-math parity fused vs flax, fwd + grads
    ref, fus = _pair(0.0)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, text, lens, train=False)

    o_ref = jax.jit(lambda v: ref.apply(v, text, lens, train=False))(variables)
    o_fus = jax.jit(lambda v: fus.apply(v, text, lens, train=False))(variables)
    m = np.asarray(o_ref[3])
    for name, a, b, mm in (("x_m", o_ref[0], o_fus[0], m),
                           ("logw", o_ref[2], o_fus[2], m[..., 0])):
        err = float(np.abs((np.asarray(a) - np.asarray(b)) * mm).max())
        print(f"fwd {name}: max err (valid) = {err:.3e}")
        assert err < 5e-4, f"{name} forward mismatch"

    def loss(block):
        def f(v):
            x_m, x_logs, logw, mask = block.apply(
                v, text, lens, train=True,
                rngs={"dropout": jax.random.PRNGKey(7)})
            return (jnp.sum((x_m * mask) ** 2)
                    + jnp.sum((logw * mask[..., 0]) ** 2))
        return f

    g_ref = jax.jit(jax.grad(loss(ref)))(variables)
    g_fus = jax.jit(jax.grad(loss(fus)))(variables)
    worst = 0.0
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_fus)[0]):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-2)
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
