"""VQ-TTS tests: grouped quantization semantics, forward, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_masters_thesis_tpu.models.vqtts.bottleneck import GroupedBottleneck
from speech_masters_thesis_tpu.models.vqtts.model import VQTTS, pairwise_l2
from speech_masters_thesis_tpu.utils.config import Config

VQTTS_CONFIG = {
    "model": {
        "n_speakers": 1, "gin_channels": 0,
        "encoder": {
            "n_vocab": 11, "out_channels": 8, "hidden_channels": 12,
            "filter_channels": 24, "filter_channels_dp": 24, "kernel_size": 3,
            "p_dropout": 0.1, "n_layers": 2, "n_heads": 2, "window_size": 4,
            "prenet": True, "mean_only": True,
        },
        "levels": 3, "downs_t": [3, 3, 2], "strides_t": [2, 2, 2],
        "emb_width": 8, "l_bins": 6, "mu": 0.99, "multipliers": [2, 1, 1],
        "width": 8, "depth": 2, "m_conv": 1.0, "revival_threshold": 1.0,
        "use_bottleneck": True, "dilation_growth_rate": 3, "dilation_cycle": None,
        "kernel_size_growth_rate": 2, "kernel_size_cycle": None,
        "reverse_decoder_dilation": True, "zero_out": True,
        "block_type": "gated_hifi", "ddi": False,
        "loss": {
            "commit": 0.05, "multispectral": 1.0, "align": 0.1,
            "l1": 0.0, "l2": 1.0, "linf": 0.02, "linf_topk": 64,
            "n_ffts": [512], "hop_lengths": [128], "win_lengths": [512],
            "window": "hann", "log": False,
        },
    },
    "dataset": {"n_mels": 8, "intersperse_blanks": True},
}


def test_pairwise_l2_matches_direct():
    rng = np.random.RandomState(0)
    a = rng.randn(2, 3, 5).astype(np.float32)
    b = rng.randn(2, 4, 5).astype(np.float32)
    out = np.asarray(pairwise_l2(jnp.asarray(a), jnp.asarray(b)))
    direct = np.sqrt(((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1))
    np.testing.assert_allclose(out, direct, rtol=1e-4, atol=1e-5)


def test_grouped_bottleneck_restricts_to_phoneme_group():
    n_vocab, l_bins, c = 4, 3, 8
    bn = GroupedBottleneck(k_bins=n_vocab * l_bins, emb_width=c, mu=0.99,
                           threshold=1.0, n_vocab=n_vocab, l_bins=l_bins)
    rng = np.random.RandomState(1)
    b, t_x, t_y = 1, 2, 6
    y_enc = jnp.asarray(rng.randn(b, t_y, c).astype(np.float32))
    x_id = jnp.asarray([[1, 3]])
    # hard alignment: first 3 frames -> token 0 (id 1), rest -> token 1 (id 3)
    attn = np.zeros((b, t_x, t_y), np.float32)
    attn[0, 0, :3] = 1
    attn[0, 1, 3:] = 1
    attn = jnp.asarray(attn)

    key = jax.random.PRNGKey(0)
    variables = bn.init({"params": key, "codebook": key}, y_enc, x_id, attn, update_k=False)
    # hand-set a recognizable codebook
    k = np.arange(n_vocab * l_bins * c, dtype=np.float32).reshape(n_vocab * l_bins, c) / 100
    variables = {"codebook": dict(variables["codebook"],
                                  k=jnp.asarray(k),
                                  initialized=jnp.ones((), jnp.bool_))}

    q_rel, y_d, commit, metrics = bn.apply(variables, y_enc, x_id, attn, update_k=False)
    q_rel = np.asarray(q_rel)
    assert q_rel.shape == (b, t_y)
    assert (q_rel >= 0).all() and (q_rel < l_bins).all()
    # verify each frame picked the best centroid within its phoneme's group
    y_np = np.asarray(y_enc)[0]
    for j in range(t_y):
        pid = 1 if j < 3 else 3
        group = k[pid * l_bins:(pid + 1) * l_bins]
        expected = np.argmin(((y_np[j] - group) ** 2).sum(-1))
        assert q_rel[0, j] == expected, j


@pytest.fixture(scope="module")
def vqtts():
    cfg = Config(VQTTS_CONFIG)
    model = VQTTS(config=cfg.to_dict())
    rng = np.random.RandomState(2)
    t_audio = 256 * 8  # compression 2^(3+3+2)=256
    tokens = jnp.asarray(rng.randint(0, 12, (2, 5)))
    token_lens = jnp.asarray([5, 4])
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, t_audio)).astype(np.float32))
    audio_lens = jnp.asarray([t_audio, t_audio - 256])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key, "codebook": key},
                           tokens, token_lens, audio, audio_lens, train=False)
    return model, variables, tokens, token_lens, audio, audio_lens


def test_vqtts_training_forward(vqtts):
    model, variables, tokens, token_lens, audio, audio_lens = vqtts
    key = jax.random.PRNGKey(1)
    (loss_dict, metrics), mutated = model.apply(
        variables, tokens, token_lens, audio, audio_lens, train=True,
        rngs={"dropout": key, "codebook": key}, mutable=["codebook"])
    for k in ["loss", "loss_recon", "loss_stft", "loss_commit", "loss_dur",
              "loss_align", "loss_ce"]:
        assert np.isfinite(float(loss_dict[k])), k
    assert loss_dict["yh"].shape == audio.shape
    assert 0.0 <= float(metrics["q_acc"]) <= 1.0
    assert bool(mutated["codebook"]["quant_bottleneck"]["initialized"])


def test_vqtts_eval_decodes_predicted_codes(vqtts):
    model, variables, tokens, token_lens, audio, audio_lens = vqtts
    (loss_dict, _) = model.apply(variables, tokens, token_lens, audio, audio_lens,
                                 train=False)
    assert loss_dict["yh"].shape == audio.shape
    assert np.isfinite(np.asarray(loss_dict["yh"])).all()


def test_vqtts_model_fused_forward_matches(vqtts):
    """Whole VQTTS eval forward: fused codec blocks + fused TextEncoder
    layers (model.fused_blocks / model.fused_encoder) == unfused, same
    variables (identical param tree). Guards the model-level wiring of
    ops/pallas/{gated_hifi,enc_layer}.py — the component kernels have their
    own parity suites."""
    model, variables, tokens, token_lens, audio, audio_lens = vqtts
    cfg_fus = Config({**VQTTS_CONFIG,
                      "model": {**VQTTS_CONFIG["model"],
                                "fused_blocks": True, "fused_encoder": True}})
    model_fus = VQTTS(config=cfg_fus.to_dict())
    (ld_ref, _) = model.apply(variables, tokens, token_lens, audio, audio_lens,
                              train=False)
    (ld_fus, _) = model_fus.apply(variables, tokens, token_lens, audio,
                                  audio_lens, train=False)
    np.testing.assert_allclose(float(ld_ref["loss"]), float(ld_fus["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_ref["yh"]),
                               np.asarray(ld_fus["yh"]), rtol=1e-3, atol=1e-4)


def test_vqtts_gradients(vqtts):
    model, variables, tokens, token_lens, audio, audio_lens = vqtts
    key = jax.random.PRNGKey(3)

    def loss_fn(params):
        (ld, _), _ = model.apply(
            {"params": params, "codebook": variables["codebook"]},
            tokens, token_lens, audio, audio_lens, train=True,
            rngs={"dropout": key, "codebook": key}, mutable=["codebook"])
        return ld["loss"]

    # jit the grad: one cached XLA program instead of thousands of
    # eager op dispatches (1-core host; persistent test cache)
    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # text encoder must receive gradient (through duration + CE + align paths)
    te = jax.tree.leaves(grads["text_encoder"])
    assert any(float(jnp.abs(g).max()) > 0 for g in te)
