"""Fused Pallas CouplingBlock conditioner (ops/pallas/wn_coupling.py) vs flax.

Interpret mode on the CPU backend (conftest). Dropout needs the TPU hardware
PRNG, so train-mode-with-dropout runs on hardware only (tools/wn_check.py);
here the kernel runs dropout-off (eval / p=0), which covers the start/WN/end
fusion, masking, length handling and the full gradient plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_masters_thesis_tpu.models.glow_tts.flows import CouplingBlock


def _mk(B=2, T=96, C=16, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-1, 1, (B, T, C)).astype(np.float32)
    lens = rng.randint(T // 2, T + 1, (B,))
    lens[0] = T
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)[..., None]
    return jnp.asarray(x), jnp.asarray(mask)


def _pair(C=16, hidden=24, n_layers=3, k=5, dil=1):
    kw = dict(in_channels=C, hidden_channels=hidden, kernel_size=k,
              dilation_rate=dil, n_layers=n_layers, p_dropout=0.0)
    return CouplingBlock(fused=False, **kw), CouplingBlock(fused=True, **kw)


def _randomize_end(variables, seed=3):
    """The end conv is zero-init (identity coupling); give it real weights so
    parity actually exercises the conditioner output."""
    rng = np.random.RandomState(seed)
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    end = params["end"]
    end["kernel"] = jnp.asarray(
        rng.normal(0, 0.3, end["kernel"].shape).astype(np.float32))
    end["bias"] = jnp.asarray(
        rng.normal(0, 0.1, end["bias"].shape).astype(np.float32))
    return {"params": params}


@pytest.mark.parametrize("dil", [1, 2])
def test_forward_parity(dil):
    ref, fus = _pair(dil=dil)
    x, mask = _mk()
    variables = _randomize_end(
        ref.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False))
    y_ref, ld_ref = ref.apply(variables, x, mask, train=False)
    y_fus, ld_fus = fus.apply(variables, x, mask, train=False)
    np.testing.assert_allclose(np.asarray(y_ref * mask), np.asarray(y_fus * mask),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ld_ref), np.asarray(ld_fus),
                               rtol=2e-5, atol=1e-4)


def test_param_tree_identical():
    ref, fus = _pair()
    x, mask = _mk()
    v_ref = ref.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
    v_fus = fus.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_fus)
    assert jax.tree.map(lambda a: a.shape, v_ref) == jax.tree.map(lambda a: a.shape, v_fus)


def test_gradient_parity():
    ref, fus = _pair()
    x, mask = _mk(seed=1)
    variables = _randomize_end(
        ref.init({"params": jax.random.PRNGKey(1)}, x, mask, train=False))

    def loss(block):
        def f(v, xx):
            y, ld = block.apply(v, xx, mask, train=False)
            return jnp.sum((y * mask) ** 2) + jnp.sum(ld)
        return f

    g_ref = jax.grad(loss(ref), argnums=(0, 1))(variables, x)
    g_fus = jax.grad(loss(fus), argnums=(0, 1))(variables, x)
    # atol scaled to the grad magnitude: the kernel accumulates conv taps in
    # a different (but still fp32) order than XLA's conv lowering
    np.testing.assert_allclose(np.asarray(g_ref[1]), np.asarray(g_fus[1]),
                               rtol=2e-4, atol=1e-4)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref[0])[0],
            jax.tree_util.tree_flatten_with_path(g_fus[0])[0]):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=2e-4, atol=1e-6 * max(1.0, np.abs(a).max()),
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(pa)}")


def test_masked_positions_do_not_leak():
    ref, fus = _pair()
    x, mask = _mk(seed=2)
    variables = _randomize_end(
        ref.init({"params": jax.random.PRNGKey(2)}, x, mask, train=False))
    y1, _ = fus.apply(variables, x, mask, train=False)
    x2 = jnp.where(mask > 0, x, 1e3)
    y2, _ = fus.apply(variables, x2, mask, train=False)
    np.testing.assert_allclose(np.asarray(y1 * mask), np.asarray(y2 * mask),
                               rtol=2e-5, atol=2e-6)


def test_reverse_roundtrip():
    """forward then reverse through the fused conditioner is identity."""
    _, fus = _pair()
    x, mask = _mk(seed=4)
    variables = _randomize_end(
        fus.init({"params": jax.random.PRNGKey(4)}, x, mask, train=False))
    z, _ = fus.apply(variables, x * mask, mask, train=False)
    x_rt, _ = fus.apply(variables, z, mask, reverse=True, train=False)
    np.testing.assert_allclose(np.asarray(x_rt * mask), np.asarray(x * mask),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_layers,k,dil,T", [
    (1, 3, 1, 40),      # single layer, small kernel
    (5, 5, 2, 200),     # deeper than shipped, dilated
    (2, 7, 1, 128),     # wide kernel
])
def test_shape_sweep_fwd_and_grad(n_layers, k, dil, T):
    """Kernel correctness across layer count / kernel / dilation / T."""
    ref, fus = _pair(n_layers=n_layers, k=k, dil=dil)
    x, mask = _mk(T=T)
    variables = _randomize_end(
        ref.init({"params": jax.random.PRNGKey(9)}, x, mask, train=False))
    y_ref, _ = ref.apply(variables, x, mask, train=False)
    y_fus, _ = fus.apply(variables, x, mask, train=False)
    np.testing.assert_allclose(np.asarray(y_ref * mask), np.asarray(y_fus * mask),
                               rtol=2e-5, atol=2e-6)

    def f(block):
        def loss(v, xx):
            y, _ = block.apply(v, xx, mask, train=False)
            return jnp.sum((y * mask) ** 2)
        return loss

    g_ref = jax.grad(f(ref))(variables, x)
    g_fus = jax.grad(f(fus))(variables, x)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_fus)[0]):
        a = np.asarray(a)
        np.testing.assert_allclose(
            a, np.asarray(b), rtol=2e-4, atol=1e-6 * max(1.0, np.abs(a).max()),
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")


def test_fallback_above_max_t():
    """Sequences longer than fused_max_t use the flax path (same results)."""
    kw = dict(in_channels=16, hidden_channels=24, kernel_size=5,
              dilation_rate=1, n_layers=3, p_dropout=0.0)
    small = CouplingBlock(fused=True, fused_max_t=8, **kw)  # forces fallback
    ref = CouplingBlock(fused=False, **kw)
    x, mask = _mk(seed=5)
    variables = _randomize_end(
        ref.init({"params": jax.random.PRNGKey(5)}, x, mask, train=False))
    y_ref, _ = ref.apply(variables, x, mask, train=False)
    y_fb, _ = small.apply(variables, x, mask, train=False)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fb),
                               rtol=1e-6, atol=1e-7)


def test_fused_shard_map_data_parallel():
    """With an ambient mesh, the fused conditioner runs per-shard (not
    replicated): output stays sharded on 'data', grads match the flax path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh

    mesh = make_data_mesh()  # publishes the ambient mesh
    ref, fus = _pair()
    B, T, C = 8, 96, 16
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T, C)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)
    variables = _randomize_end(
        ref.init({"params": jax.random.PRNGKey(7)}, x, mask, train=False))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ms = jax.device_put(mask, NamedSharding(mesh, P("data")))

    @jax.jit
    def fy(v, xx, mm):
        y, _ = fus.apply(v, xx, mm, train=False)
        return y

    y = fy(variables, xs, ms)
    assert y.sharding.spec == P("data"), y.sharding  # NOT replicated
    y_ref, _ = ref.apply(variables, x, mask, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-6)

    def loss(block):
        def f(v, xx, mm):
            yy, ld = block.apply(v, xx, mm, train=False)
            return jnp.sum(yy ** 2) + jnp.sum(ld)
        return f

    g_ref = jax.grad(loss(ref))(variables, x, mask)
    g_fus = jax.jit(jax.grad(loss(fus)))(variables, xs, ms)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5 * max(1.0, np.abs(a).max()))


def test_glow_model_fused_forward_matches():
    """Whole GlowTTS supervised_step: fused_blocks True == False (tiny cfg)."""
    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.utils.config import Config

    base = {
        "model": {
            "_import_": "models.glow_tts.glow_tts.GlowTTS",
            "n_speakers": 1, "gin_channels": 0, "intersperse_blanks": None,
            "encoder": {"n_vocab": 148, "out_channels": None, "hidden_channels": 16,
                        "filter_channels": 32, "filter_channels_dp": 16,
                        "kernel_size": 3, "p_dropout": 0.1, "n_layers": 1,
                        "n_heads": 2, "window_size": 4, "prenet": True,
                        "mean_only": True},
            "decoder": {"in_channels": None, "hidden_channels": 16, "kernel_size": 5,
                        "n_blocks": 2, "n_layers": 2, "n_sqz": 2, "n_split": 4,
                        "sigmoid_scale": False, "p_dropout": 0.05,
                        "dilation_rate": 1},
            "ddi": False,
        },
        "dataset": {"_import_": "datasets.ljspeech.LJSpeech", "sample_rate": 22050,
                    "n_fft": 256, "hop_length": 64, "win_length": 256, "n_mels": 8,
                    "intersperse_blanks": True, "segment_length": -1,
                    "use_token": True, "use_spect": True, "use_audio": False},
        "train": {"log_dir": "/tmp/x", "seed": 0, "batch_size": 2},
    }
    cfg_ref = Config({**base, "model": {**base["model"], "fused_blocks": False}})
    cfg_fus = Config({**base, "model": {**base["model"], "fused_blocks": True}})

    model_ref = get_model(cfg_ref)
    model_fus = get_model(cfg_fus)
    variables = init_model_variables(model_ref, cfg_ref, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    t_text, t_mel = 10, 32
    batch = {
        "token": jnp.asarray(rng.randint(1, 140, (2, t_text)), jnp.int32),
        "token_len": jnp.asarray([t_text, t_text - 3], jnp.int32),
        "spect": jnp.asarray(rng.randn(2, t_mel, 8).astype(np.float32)),
        "spect_len": jnp.asarray([t_mel, t_mel - 8], jnp.int32),
        "speaker": None,
    }
    ld_ref, m_ref = model_ref.apply(variables, batch, train=False,
                                    method=model_ref.supervised_step)
    ld_fus, m_fus = model_fus.apply(variables, batch, train=False,
                                    method=model_fus.supervised_step)
    np.testing.assert_allclose(float(ld_ref["loss"]), float(ld_fus["loss"]),
                               rtol=1e-4)


def test_fused_flow_step_matches_unfused_decoder():
    """fused flow-step kernel (ActNorm+InvConvNear+conditioner in one Pallas
    call, interpret mode on CPU): forward, logdet and every grad match the
    unfused FlowSpecDecoder within f32 tolerance."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np

    from speech_masters_thesis_tpu.models.glow_tts.encoder import FlowSpecDecoder

    B, T, C = 2, 32, 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    lens = np.array([32, 24])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))[..., None]

    kw = dict(in_channels=C, hidden_channels=16, kernel_size=3, dilation_rate=1,
              n_blocks=2, n_layers=2, p_dropout=0.0, n_split=4, n_sqz=2)
    dec0 = FlowSpecDecoder(fused=False, **kw)
    dec1 = FlowSpecDecoder(fused=True, **kw)
    v = dec0.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
    z0, ld0 = dec0.apply(v, x, mask, train=False)
    z1, ld1 = dec1.apply(v, x, mask, train=False)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ld0), np.asarray(ld1), atol=2e-5)

    def loss(variables, dec):
        z, ld = dec.apply(variables, x, mask, train=False)
        return jnp.sum(z ** 2) - jnp.mean(ld)

    g0 = jax.grad(loss)(v, dec0)
    g1 = jax.grad(loss)(v, dec1)
    errs = jtu.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    scale = jtu.tree_map(lambda a: float(jnp.max(jnp.abs(a))) + 1.0, g0)
    rel = max(jtu.tree_leaves(jtu.tree_map(lambda e, s: e / s, errs, scale)))
    assert rel < 5e-5, (rel, errs)
