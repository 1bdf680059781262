"""Transformer LM tests: torch weight-transplant parity, loss masking, sampling."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from speech_masters_thesis_tpu.models.transformer_lm.model import (
    BOS,
    OFFSET,
    PAD,
    TransformerEncoderLayer,
    TransformerLM,
    sinusoidal_table,
)
from speech_masters_thesis_tpu.utils.config import Config

D, H, FF, L, VOCAB = 16, 2, 32, 2, 24

LM_CONFIG = {
    "model": {
        "vocab_size": VOCAB, "embed_dim": D, "max_len": 128, "num_layers": L,
        "d_model": D, "nhead": H, "dim_feedforward": FF, "dropout": 0.0,
        "activation": "relu", "layer_norm_eps": 1e-5, "norm_first": False,
        "loss_type": "ce",
    }
}


def test_sinusoidal_table_matches_torch_formula():
    pe = sinusoidal_table(64, D)
    position = torch.arange(64).unsqueeze(1).float()
    div_term = torch.exp(torch.arange(0, D, 2).float() * (-math.log(10000.0) / D))
    ref = torch.zeros(64, D)
    ref[:, 0::2] = torch.sin(position * div_term)
    ref[:, 1::2] = torch.cos(position * div_term)
    np.testing.assert_allclose(pe, ref.numpy(), atol=1e-6)


def test_encoder_layer_matches_torch():
    """Weight-transplant parity with torch nn.TransformerEncoderLayer (post-LN)."""
    torch.manual_seed(0)
    ref_layer = torch.nn.TransformerEncoderLayer(
        d_model=D, nhead=H, dim_feedforward=FF, dropout=0.0, activation="relu",
        layer_norm_eps=1e-5, norm_first=False)
    ref_layer.eval()

    layer = TransformerEncoderLayer(D, H, FF, dropout=0.0, layer_norm_eps=1e-5)
    x_np = np.random.RandomState(0).randn(2, 6, D).astype(np.float32)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                           jnp.zeros((1, 1, 1, 1)), train=False)

    sd = {k: v.detach().numpy() for k, v in ref_layer.state_dict().items()}
    params = {
        "self_attn": {
            "in_proj": {"kernel": sd["self_attn.in_proj_weight"].T,
                        "bias": sd["self_attn.in_proj_bias"]},
            "out_proj": {"kernel": sd["self_attn.out_proj.weight"].T,
                         "bias": sd["self_attn.out_proj.bias"]},
        },
        "linear1": {"kernel": sd["linear1.weight"].T, "bias": sd["linear1.bias"]},
        "linear2": {"kernel": sd["linear2.weight"].T, "bias": sd["linear2.bias"]},
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
    }
    params = jax.tree.map(jnp.asarray, params)

    # causal comparison: torch takes [T, B, C] and a float mask
    t = x_np.shape[1]
    causal_torch = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
    ref_out = ref_layer(torch.from_numpy(x_np).permute(1, 0, 2), src_mask=causal_torch)
    ref_out = ref_out.permute(1, 0, 2).detach().numpy()

    causal_bias = jnp.where(jnp.tril(jnp.ones((t, t))) > 0, 0.0, -1e9)[None, None]
    out = layer.apply({"params": params}, jnp.asarray(x_np), causal_bias, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


@pytest.fixture(scope="module")
def lm():
    cfg = Config(LM_CONFIG)
    model = TransformerLM(config=cfg.to_dict())
    tokens = jnp.asarray(np.random.RandomState(0).randint(OFFSET, VOCAB + OFFSET, (2, 10)))
    tokens = tokens.at[:, 0].set(BOS).at[1, 7:].set(PAD)
    lens = jnp.asarray([10, 7])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, tokens, lens, train=False)
    return model, variables, tokens, lens


def test_lm_forward_and_masked_loss(lm):
    model, variables, tokens, lens = lm
    (loss_dict, metrics) = model.apply(variables, tokens, lens, train=False)
    assert np.isfinite(float(loss_dict["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_pad_positions_do_not_affect_loss(lm):
    model, variables, tokens, lens = lm
    (ld_a, _) = model.apply(variables, tokens, lens, train=False)
    # swap PAD for BOS in the padding region: still below OFFSET (masked out
    # of the loss, as in the reference's target >= OFFSET mask), and attention
    # over padding keys is masked by key_mask — loss must be identical
    tokens_b = tokens.at[1, 7:].set(BOS)
    (ld_b, _) = model.apply(variables, tokens_b, lens, train=False)
    np.testing.assert_allclose(float(ld_a["loss"]), float(ld_b["loss"]), rtol=2e-5)


def test_sampling_shapes_and_determinism(lm):
    model, variables, _, _ = lm
    rng = jax.random.PRNGKey(42)
    audio, codes = model.apply(variables, 2, 12, rng, sigma=1.0,
                               method=TransformerLM.sample)
    assert codes.shape == (2, 12)
    assert int(codes.min()) >= 0 and int(codes.max()) < VOCAB
    audio2, codes2 = model.apply(variables, 2, 12, rng, sigma=1.0,
                                 method=TransformerLM.sample)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


def test_kv_cache_sampling_matches_full_forward(lm):
    """Greedy-equivalent check: the cached decode path must produce the same
    logits trajectory as a full forward over the sampled prefix."""
    model, variables, _, _ = lm
    rng = jax.random.PRNGKey(7)
    _, codes = model.apply(variables, 1, 8, rng, sigma=1.0, method=TransformerLM.sample)
    # replay: feed [BOS] + codes+OFFSET through the training forward and check
    # that each step's argmax distribution is consistent with a full re-forward
    seq = jnp.concatenate([jnp.full((1, 1), BOS, jnp.int32),
                           np.asarray(codes)[:, :-1] + OFFSET], axis=1)
    lens = jnp.full((1,), seq.shape[1], jnp.int32)

    def full_logits(tokens):
        t = tokens.shape[1]
        from speech_masters_thesis_tpu.ops.basic import sequence_mask
        key_mask = sequence_mask(lens, t)
        causal = jnp.tril(jnp.ones((t, t)))
        bias = jnp.where((causal[None, None] * key_mask[:, None, None, :]) > 0, 0.0, -1e9)
        h = model.apply(variables, tokens, bias, False, method=TransformerLM._backbone)
        return model.apply(variables, h, method=lambda m, hh: m.classifier(hh))

    logits_full = np.asarray(full_logits(seq))  # [1, T, vocab]

    # decode path logits, recomputed step by step with the same cache mechanics
    cfg = Config(LM_CONFIG).model
    d_head = D // H
    k_caches = jnp.zeros((L, 1, seq.shape[1], H, d_head))
    v_caches = jnp.zeros_like(k_caches)

    def decode_logits(tokens):
        outs = []
        kc, vc = k_caches, v_caches
        for pos in range(tokens.shape[1]):
            tok = tokens[:, pos:pos + 1]

            def step(m, tok, kc, vc, pos):
                x = m.embedding(tok) * math.sqrt(m.d_model)
                x = x + jax.lax.dynamic_slice_in_dim(m.pe, pos, 1, axis=0)[None]
                new_k, new_v = [], []
                for i, layer in enumerate(m.layers):
                    x, k_c, v_c = layer.decode_step(x, kc[i], vc[i], pos)
                    new_k.append(k_c)
                    new_v.append(v_c)
                x = m.final_norm(x)
                return m.classifier(x[:, 0]), jnp.stack(new_k), jnp.stack(new_v)

            logits, kc, vc = model.apply(variables, tok, kc, vc, pos, method=step)
            outs.append(np.asarray(logits))
        return np.stack(outs, axis=1)

    logits_decode = decode_logits(seq)
    np.testing.assert_allclose(logits_decode, logits_full, atol=2e-4)
