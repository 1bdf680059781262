"""Glow-TTS tests: flow invertibility, DDI, encoder shapes, training forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech_masters_thesis_tpu.models.glow_tts.encoder import (
    FlowSpecDecoder,
    TextEncoder,
    squeeze,
    unsqueeze,
)
from speech_masters_thesis_tpu.models.glow_tts.flows import ActNorm, CouplingBlock, InvConvNear
from speech_masters_thesis_tpu.models.glow_tts.model import GlowTTS
from speech_masters_thesis_tpu.utils.config import Config

N_MELS = 8

GLOW_CONFIG = {
    "model": {
        "n_speakers": 1, "gin_channels": 0, "intersperse_blanks": None,
        "encoder": {
            "n_vocab": 20, "out_channels": None, "hidden_channels": 12,
            "filter_channels": 24, "filter_channels_dp": 24, "kernel_size": 3,
            "p_dropout": 0.1, "n_layers": 2, "n_heads": 2, "window_size": 4,
            "prenet": True, "mean_only": True,
        },
        "decoder": {
            "in_channels": None, "hidden_channels": 12, "kernel_size": 5,
            "n_blocks": 3, "n_layers": 2, "n_sqz": 2, "n_split": 4,
            "sigmoid_scale": False, "p_dropout": 0.05, "dilation_rate": 1,
        },
        "ddi": True,
    },
    "dataset": {"n_mels": N_MELS, "intersperse_blanks": True},
}


def test_squeeze_unsqueeze_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 6).astype(np.float32))
    mask = jnp.ones((2, 12, 1))
    xs, ms = squeeze(x, mask, 2)
    assert xs.shape == (2, 6, 12)
    xu, mu = unsqueeze(xs, ms, 2)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("flow_cls,kwargs", [
    (ActNorm, dict(channels=16)),
    (InvConvNear, dict(channels=16, n_split=4)),
    (CouplingBlock, dict(in_channels=16, hidden_channels=12, kernel_size=5,
                         dilation_rate=1, n_layers=2)),
])
def test_flow_invertibility(flow_cls, kwargs):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 16).astype(np.float32))
    mask = jnp.ones((2, 10, 1))
    flow = flow_cls(**kwargs)
    variables = flow.init(jax.random.PRNGKey(0), x, mask)
    z, logdet = flow.apply(variables, x, mask, reverse=False)
    x_rec, _ = flow.apply(variables, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    if not isinstance(flow, ActNorm):
        assert logdet is not None


def test_full_flow_decoder_invertibility():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 12, N_MELS).astype(np.float32))
    mask = jnp.ones((2, 12, 1))
    dec = FlowSpecDecoder(in_channels=N_MELS, hidden_channels=12, kernel_size=5,
                          dilation_rate=1, n_blocks=3, n_layers=2, n_sqz=2, n_split=4)
    variables = dec.init(jax.random.PRNGKey(0), x, mask)
    z, logdet = dec.apply(variables, x, mask, reverse=False)
    assert z.shape == x.shape
    assert logdet.shape == (2,)
    x_rec, _ = dec.apply(variables, z, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_text_encoder_shapes():
    enc = TextEncoder(n_vocab=21, out_channels=N_MELS, hidden_channels=12,
                      filter_channels=24, filter_channels_dp=24, n_heads=2,
                      n_layers=2, kernel_size=3, p_dropout=0.0, window_size=4,
                      mean_only=True, prenet=True)
    tokens = jnp.asarray(np.random.RandomState(3).randint(0, 21, (2, 9)))
    lens = jnp.asarray([9, 6])
    variables = enc.init(jax.random.PRNGKey(0), tokens, lens, train=False)
    x_m, x_logs, logw, mask = enc.apply(variables, tokens, lens, train=False)
    assert x_m.shape == (2, 9, N_MELS)
    assert np.allclose(np.asarray(x_logs), 0.0)  # mean_only
    assert logw.shape == (2, 9)
    assert mask.shape == (2, 9, 1)
    # masked positions produce zeros
    assert np.allclose(np.asarray(x_m)[1, 6:], 0.0)


@pytest.fixture(scope="module")
def glow():
    cfg = Config(GLOW_CONFIG)
    model = GlowTTS(config=cfg.to_dict())
    rng = np.random.RandomState(4)
    tokens = jnp.asarray(rng.randint(0, 21, (2, 7)))
    token_lens = jnp.asarray([7, 5])
    mels = jnp.asarray(rng.randn(2, 16, N_MELS).astype(np.float32))
    mel_lens = jnp.asarray([16, 12])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, tokens, token_lens,
                           mels, mel_lens, train=False)
    return model, variables, tokens, token_lens, mels, mel_lens


def test_glow_training_forward(glow):
    model, variables, tokens, token_lens, mels, mel_lens = glow
    rng = jax.random.PRNGKey(1)
    (loss_dict, _) = model.apply(variables, tokens, token_lens, mels, mel_lens,
                                 train=True, rngs={"dropout": rng})
    for key in ["loss", "loss_mle", "loss_length"]:
        assert np.isfinite(float(loss_dict[key])), key
    assert loss_dict["yh"] is None  # train mode skips synthesis


def test_glow_eval_produces_mel(glow):
    model, variables, tokens, token_lens, mels, mel_lens = glow
    (loss_dict, _) = model.apply(variables, tokens, token_lens, mels, mel_lens,
                                 train=False, rngs={"sample": jax.random.PRNGKey(2)})
    assert loss_dict["yh"].shape == (2, 16, N_MELS)
    assert np.isfinite(np.asarray(loss_dict["yh"])).all()


def test_glow_gradients(glow):
    model, variables, tokens, token_lens, mels, mel_lens = glow
    rng = jax.random.PRNGKey(3)

    def loss_fn(params):
        (ld, _) = model.apply({"params": params}, tokens, token_lens, mels, mel_lens,
                              train=True, rngs={"dropout": rng})
        return ld["loss"]

    # jit the grad: one cached XLA program instead of thousands of
    # eager op dispatches (1-core host; persistent test cache)
    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_ddi_init_grafts_actnorm_stats(glow):
    model, variables, tokens, token_lens, mels, mel_lens = glow
    batch = {"token": tokens, "token_len": token_lens, "spect": mels,
             "spect_len": mel_lens, "speaker": None}
    new_vars = model.ddi_init(dict(variables), batch)
    logs_before = variables["params"]["decoder"]["actnorm_0"]["logs"]
    logs_after = new_vars["params"]["decoder"]["actnorm_0"]["logs"]
    assert np.allclose(np.asarray(logs_before), 0.0)
    assert not np.allclose(np.asarray(logs_after), 0.0)
    # post-DDI, the first flow block's output should be near-normalized
    (ld, _) = model.apply(new_vars, tokens, token_lens, mels, mel_lens,
                          train=True, rngs={"dropout": jax.random.PRNGKey(5)})
    assert np.isfinite(float(ld["loss"]))


def test_glow_inference(glow):
    model, variables, tokens, token_lens, *_ = glow
    yh, z_lengths = model.apply(variables, tokens, token_lens, jax.random.PRNGKey(9),
                                max_frames=64, method=GlowTTS.infer)
    assert yh.shape == (2, 64, N_MELS)
    assert np.isfinite(np.asarray(yh)).all()
    assert (np.asarray(z_lengths) >= 1).all()


def test_glow_speaker_conditioning():
    """Multi-speaker path: speaker embeddings condition the WN coupling."""
    cfg = dict(GLOW_CONFIG)
    import copy
    cfg = copy.deepcopy(GLOW_CONFIG)
    cfg["model"]["n_speakers"] = 3
    cfg["model"]["gin_channels"] = 4
    model = GlowTTS(config=Config(cfg).to_dict())
    rng = np.random.RandomState(8)
    tokens = jnp.asarray(rng.randint(0, 21, (2, 5)))
    token_lens = jnp.asarray([5, 4])
    mels = jnp.asarray(rng.randn(2, 8, N_MELS).astype(np.float32))
    mel_lens = jnp.asarray([8, 8])
    speaker = jnp.asarray([[0], [2]], jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, tokens, token_lens,
                           mels, mel_lens, speaker=speaker, train=False)
    (ld_a, _) = model.apply(variables, tokens, token_lens, mels, mel_lens,
                            speaker=speaker, train=False,
                            rngs={"sample": jax.random.PRNGKey(1)})
    # different speaker ids must change the output
    speaker_b = jnp.asarray([[1], [1]], jnp.int32)
    (ld_b, _) = model.apply(variables, tokens, token_lens, mels, mel_lens,
                            speaker=speaker_b, train=False,
                            rngs={"sample": jax.random.PRNGKey(1)})
    assert np.isfinite(float(ld_a["loss"]))
    assert float(ld_a["loss"]) != pytest.approx(float(ld_b["loss"]))


def test_relative_position_skew_tricks():
    """_relative_to_absolute / _absolute_to_relative vs brute-force indexing.

    rel[b,h,i,m] holds the logit for relative offset (m - (L-1)) from query i;
    absolute[b,h,i,j] must equal rel[b,h,i, j - i + L - 1].
    """
    from speech_masters_thesis_tpu.models.glow_tts.attention import (
        _absolute_to_relative,
        _get_relative_embeddings,
        _relative_to_absolute,
    )

    rng = np.random.RandomState(0)
    b, h, L = 2, 3, 7
    rel = rng.randn(b, h, L, 2 * L - 1).astype(np.float32)
    absolute = np.asarray(_relative_to_absolute(jnp.asarray(rel)))
    assert absolute.shape == (b, h, L, L)
    for i in range(L):
        for j in range(L):
            m = j - i + L - 1
            np.testing.assert_allclose(absolute[:, :, i, j], rel[:, :, i, m],
                                       err_msg=f"i={i} j={j}")

    # inverse direction
    absolute2 = rng.randn(b, h, L, L).astype(np.float32)
    rel2 = np.asarray(_absolute_to_relative(jnp.asarray(absolute2)))
    assert rel2.shape == (b, h, L, 2 * L - 1)
    for i in range(L):
        for j in range(L):
            m = j - i + L - 1
            np.testing.assert_allclose(rel2[:, :, i, m], absolute2[:, :, i, j],
                                       err_msg=f"i={i} j={j}")

    # window clipping: beyond +-window the embedding is the edge-padded zero
    window = 2
    emb = rng.randn(1, 2 * window + 1, 4).astype(np.float32)
    used = np.asarray(_get_relative_embeddings(jnp.asarray(emb), L, window))
    assert used.shape == (1, 2 * L - 1, 4)
    # centre entries match the original table
    centre = L - 1
    for off in range(-window, window + 1):
        np.testing.assert_allclose(used[:, centre + off], emb[:, window + off])
    # offsets beyond the window are zero-padded
    assert np.allclose(used[:, : centre - window], 0.0)
    assert np.allclose(used[:, centre + window + 1:], 0.0)


def test_on_device_spect_matches_host_path():
    """dataset.on_device_spect: the loader ships raw audio and the model
    computes mel inside supervised_step — for bucket-exact audio the loss
    must match the host-extracted-spect path exactly (same operator)."""
    import numpy as np

    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.ops.stft import cached_mel, host_mel
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
    cfg_dev = Config({**base, "dataset": {**base["dataset"], "on_device_spect": True}})
    cfg_host = Config(base)

    model_dev = get_model(cfg_dev)
    # elision flipped: raw audio in, no host spect
    assert cfg_dev.dataset.use_audio and not cfg_dev.dataset.use_spect
    model_host = get_model(cfg_host)
    assert cfg_host.dataset.use_spect and not cfg_host.dataset.use_audio

    variables = init_model_variables(model_host, cfg_host, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    t_text, t_samples = 10, 2048
    audio = rng.uniform(-0.5, 0.5, (2, t_samples)).astype(np.float32)
    mel_op = cached_mel(22050, 256, 64, 256, 8, 0.0, 8000.0)
    spect = np.stack([host_mel(mel_op, audio[i])[0] for i in range(2)])
    tokens = rng.randint(1, 140, (2, t_text)).astype(np.int32)
    common = {"token": jnp.asarray(tokens),
              "token_len": jnp.asarray([t_text, t_text - 2], jnp.int32),
              "speaker": None}
    batch_host = {**common, "spect": jnp.asarray(spect),
                  "spect_len": jnp.asarray([t_samples // 64] * 2, jnp.int32),
                  "audio": None, "audio_len": None}
    batch_dev = {**common, "spect": None, "spect_len": None,
                 "audio": jnp.asarray(audio),
                 "audio_len": jnp.asarray([t_samples] * 2, jnp.int32)}

    ld_h, _ = model_host.apply(variables, batch_host, train=False,
                               method=model_host.supervised_step)
    ld_d, _ = model_dev.apply(variables, batch_dev, train=False,
                              method=model_dev.supervised_step)
    np.testing.assert_allclose(float(ld_h["loss"]), float(ld_d["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_h["y"]), np.asarray(ld_d["y"]),
                               rtol=1e-5, atol=1e-6)


def test_proximal_init_copies_q_into_k():
    """proximal_init: conv_k starts as a copy of conv_q, weights AND bias
    (reference submodules.py:444-447); conv_v stays independent."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from speech_masters_thesis_tpu.models.glow_tts.attention import RelativeSelfAttention

    attn = RelativeSelfAttention(16, 16, 2, window_size=4, proximal_init=True)
    x = jnp.ones((1, 8, 16))
    variables = attn.init(jax.random.PRNGKey(0), x, x, None, train=False)
    p = variables["params"]
    np.testing.assert_array_equal(np.asarray(p["conv_q"]["kernel"]),
                                  np.asarray(p["conv_k"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(p["conv_q"]["bias"]),
                                  np.asarray(p["conv_k"]["bias"]))
    assert not np.array_equal(np.asarray(p["conv_q"]["kernel"]),
                              np.asarray(p["conv_v"]["kernel"]))

    # default (off): q and k independent — and apply works under both
    attn_off = RelativeSelfAttention(16, 16, 2, window_size=4)
    v_off = attn_off.init(jax.random.PRNGKey(0), x, x, None, train=False)
    assert not np.array_equal(np.asarray(v_off["params"]["conv_q"]["kernel"]),
                              np.asarray(v_off["params"]["conv_k"]["kernel"]))
    out = attn.apply(variables, x, x, None, train=False)
    assert np.isfinite(np.asarray(out)).all()
