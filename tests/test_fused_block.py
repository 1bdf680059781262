"""Fused Pallas GatedHiFi block (ops/pallas/gated_hifi.py) vs the flax path.

Runs in interpret mode on the CPU backend (conftest). Dropout uses the TPU
hardware PRNG which has no CPU lowering, so train-mode-with-dropout parity
is exercised on hardware (tools/fused_check.py); here the kernel runs with
dropout off (eval mode / p=0), which covers all of the tiling, halo,
masking, gating and gradient plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_masters_thesis_tpu.models.vqvae.blocks import GatedHiFiBlock


def _mk(B=2, T=700, W=16, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-1, 1, (B, T, W)).astype(np.float32)
    lens = rng.randint(T // 2, T + 1, (B,))
    lens[0] = T
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)[..., None]
    return jnp.asarray(x), jnp.asarray(mask)


def _pair(W, zero_out, depth=4, **over):
    kw = dict(n_in=W, n_depth=depth, dilation_growth_rate=3, dilation_cycle=None,
              kernel_size_growth_rate=2, kernel_size_cycle=None,
              zero_out=zero_out, res_scale=True)
    kw.update(over)
    return GatedHiFiBlock(fused=False, **kw), GatedHiFiBlock(fused=True, **kw)


@pytest.mark.parametrize("depth,dil_cycle,k_cycle,T", [
    (2, None, None, 130),     # depth below the shipped 4
    (5, 3, 2, 300),           # depth above, with dilation/kernel cycles
    (3, 2, None, 384),        # T exactly one fwd tile (if tile=384)
])
def test_shape_sweep_fwd_and_grad(depth, dil_cycle, k_cycle, T):
    """Kernel must be correct for arbitrary depth/cycle/T combinations —
    regression net for shape assumptions (a 4-branch width was once
    hardcoded in the backward)."""
    ref, fus = _pair(W=16, zero_out=False, depth=depth,
                     dilation_cycle=dil_cycle, kernel_size_cycle=k_cycle)
    x, mask = _mk(T=T)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
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


@pytest.mark.parametrize("T", [700, 100, 512])
def test_forward_parity_valid_positions(T):
    """Fused == flax at mask=1 positions across tile/halo boundaries."""
    ref, fus = _pair(W=16, zero_out=False)
    x, mask = _mk(T=T)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
    y_ref, _ = ref.apply(variables, x, mask, train=False)
    y_fus, _ = fus.apply(variables, x, mask, train=False)
    np.testing.assert_allclose(np.asarray(y_ref * mask), np.asarray(y_fus * mask),
                               rtol=2e-5, atol=2e-6)


def test_param_tree_identical():
    ref, fus = _pair(W=8, zero_out=True, depth=2)
    x, mask = _mk(T=64, W=8)
    v_ref = ref.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
    v_fus = fus.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_fus)
    assert jax.tree.map(lambda a: a.shape, v_ref) == jax.tree.map(lambda a: a.shape, v_fus)


@pytest.mark.parametrize("zero_out,depth", [(False, 4), (True, 4), (False, 3)])
def test_gradient_parity(zero_out, depth):
    """dx and every weight grad match the flax path (dropout off).

    depth=3 covers the VQ-TTS codec config (regression: the backward's
    branch-concat width was once hardcoded to 4 branches)."""
    ref, fus = _pair(W=16, zero_out=zero_out, depth=depth)
    x, mask = _mk(T=600)
    variables = ref.init({"params": jax.random.PRNGKey(1)}, x, mask, train=False)

    def loss(block):
        def f(params, xx):
            y, _ = block.apply(params, xx, mask, train=False)
            return jnp.sum((y * mask) ** 2)
        return f

    g_ref = jax.grad(loss(ref), argnums=(0, 1))(variables, x)
    g_fus = jax.grad(loss(fus), argnums=(0, 1))(variables, x)
    np.testing.assert_allclose(np.asarray(g_ref[1]), np.asarray(g_fus[1]),
                               rtol=1e-4, atol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref[0])[0],
            jax.tree_util.tree_flatten_with_path(g_fus[0])[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(pa)}")


def test_masked_positions_do_not_leak():
    """Tail garbage beyond each sequence must not change valid outputs."""
    ref, fus = _pair(W=16, zero_out=False)
    x, mask = _mk(T=640)
    variables = ref.init({"params": jax.random.PRNGKey(2)}, x, mask, train=False)
    y1, _ = fus.apply(variables, x, mask, train=False)
    # poison masked positions of the input
    x2 = jnp.where(mask > 0, x, 1e3)
    y2, _ = fus.apply(variables, x2, mask, train=False)
    np.testing.assert_allclose(np.asarray(y1 * mask), np.asarray(y2 * mask),
                               rtol=2e-5, atol=2e-6)


def test_fused_shard_map_data_parallel():
    """With an ambient mesh, the fused op runs per-shard (not replicated):
    output stays sharded on 'data' and weight grads psum correctly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh

    mesh = make_data_mesh()  # also publishes the ambient mesh
    ref, fus = _pair(W=16, zero_out=False)
    B, T, W = 8, 640, 16
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T, W)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
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
            yy, _ = block.apply(v, xx, mm, train=False)
            return jnp.sum(yy ** 2)
        return f

    g_ref = jax.grad(loss(ref))(variables, x, mask)
    g_fus = jax.jit(jax.grad(loss(fus)))(variables, xs, ms)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        a, b = np.asarray(a), np.asarray(b)
        # leaf-scaled atol: grads of this sum-of-squares probe are O(100)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * np.abs(a).max())


def test_vqvae_model_fused_forward_matches(tmp_path):
    """Whole VQ-VAE eval forward: fused_blocks=True == False (tiny config)."""
    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.utils.config import Config

    base = {
        "model": {
            "_import_": "models.vqvae.vqvae.VQVAE",
            "levels": 2, "downs_t": [2, 1], "strides_t": [2, 2], "emb_width": 16,
            "l_bins": 16, "mu": 0.99, "multipliers": [1, 1], "width": 16, "depth": 2,
            "m_conv": 1.0, "revival_threshold": 1.0, "use_bottleneck": True,
            "dilation_growth_rate": 3, "dilation_cycle": None,
            "kernel_size_growth_rate": 2, "kernel_size_cycle": None,
            "reverse_decoder_dilation": True, "zero_out": False,
            "block_type": "gated_hifi", "ddi": False,
            "loss": {"commit": 0.05, "multispectral": 1.0, "l1": 0.0, "l2": 1.0,
                     "linf": 0.02, "linf_topk": 32, "n_ffts": [256],
                     "hop_lengths": [64], "win_lengths": [256], "window": "hann",
                     "log": True},
        },
        "dataset": {"_import_": "datasets.ljspeech.LJSpeech", "sample_rate": 22050,
                    "n_fft": 256, "hop_length": 64, "win_length": 256, "n_mels": 20,
                    "intersperse_blanks": True, "segment_length": -1,
                    "use_token": False, "use_spect": False, "use_audio": True},
        "train": {"log_dir": str(tmp_path), "seed": 0, "batch_size": 2},
    }
    cfg_ref = Config({**base, "model": {**base["model"], "fused_blocks": False}})
    cfg_fus = Config({**base, "model": {**base["model"], "fused_blocks": True}})

    model_ref = get_model(cfg_ref)
    model_fus = get_model(cfg_fus)
    variables = init_model_variables(model_ref, cfg_ref, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    t = 1024
    batch = {
        "audio": jnp.asarray(rng.uniform(-0.5, 0.5, (2, t)).astype(np.float32)),
        "audio_len": jnp.asarray([t, t - 256], jnp.int32),
        "speaker": None,
    }
    ld_ref, _ = model_ref.apply(variables, batch, train=False,
                                method=model_ref.supervised_step)
    ld_fus, _ = model_fus.apply(variables, batch, train=False,
                                method=model_fus.supervised_step)
    np.testing.assert_allclose(float(ld_ref["loss"]), float(ld_fus["loss"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_ref["yh"]), np.asarray(ld_fus["yh"]),
                               rtol=1e-4, atol=1e-5)


def test_fused_output_is_sequence_masked():
    """Round-3 contract: the kernel masks its OUTPUT past each sequence's
    length (== the old downstream out*mask, bitwise), so MaskedConv1d
    consumers skip their x*mask round trip (encdec.py pre_masked)."""
    x, mask = _mk(T=700, W=16)
    ref, fus = _pair(16, zero_out=False)
    v = ref.init({"params": jax.random.PRNGKey(0)}, x, mask, train=False)
    y_ref, _ = ref.apply(v, x, mask, train=False)
    y_fus, _ = fus.apply(v, x, mask, train=False)
    # fused == unfused * mask everywhere (not just at valid positions)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref * mask),
                               rtol=2e-5, atol=2e-5)
    assert float(jnp.max(jnp.abs(y_fus * (1 - mask)))) == 0.0
