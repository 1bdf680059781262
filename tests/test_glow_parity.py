"""Glow-TTS cross-framework parity vs PyTorch reference semantics.

Per-module output parity for ActNorm / InvConvNear / CouplingBlock(WN) /
windowed relative attention / ConvReluNorm / FFN / DurationPredictor, plus
whole TextEncoder and FlowSpecDecoder stacks transplanted through
tools/import_torch_checkpoint.py (the Glow-TTS checkpoint-import path,
reference modules.py:134-236 incl. weight_norm v/g buffers).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tools.import_torch_checkpoint import import_glow_tts
from speech_masters_thesis_tpu.models.glow_tts import attention as jattn
from speech_masters_thesis_tpu.models.glow_tts import flows as jflows
from speech_masters_thesis_tpu.models.glow_tts.encoder import FlowSpecDecoder, TextEncoder
from speech_masters_thesis_tpu.utils.config import Config

from torch_ref import glow_ref as tref


def _randomize(module, seed, scale=0.3):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * scale)


def _sd(module):
    return {k: np.asarray(v) for k, v in module.state_dict().items()}


def _io(b=2, t=12, c=8, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, t, c).astype(np.float32)
    mask = np.ones((b, t, 1), np.float32)
    mask[1, t - 3:] = 0.0
    x = x * mask
    return x, mask


def _tch(x):  # NTC numpy -> NCT torch
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 2, 1)))


# --------------------------------------------------------------------------
# flow layers
# --------------------------------------------------------------------------
def test_actnorm_parity_forward_reverse():
    x, mask = _io()
    tm = tref.ActNorm(8)
    _randomize(tm, 1)
    params = {"logs": _sd(tm)["logs"].reshape(-1), "bias": _sd(tm)["bias"].reshape(-1)}
    jm = jflows.ActNorm(8)
    for reverse in (False, True):
        with torch.no_grad():
            tz, tld = tm(_tch(x), _tch(mask), reverse=reverse)
        jz, jld = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask),
                           reverse=reverse)
        np.testing.assert_allclose(np.asarray(jz), tz.numpy().transpose(0, 2, 1),
                                   rtol=1e-5, atol=1e-6)
        if not reverse:
            np.testing.assert_allclose(np.asarray(jld), tld.numpy(), rtol=1e-5)


def test_invconv_parity_forward_reverse_logdet():
    x, mask = _io(c=8)
    tm = tref.InvConvNear(8, n_split=4)
    with torch.no_grad():
        tm.weight *= 1.5  # non-orthogonal so logdet is O(1), not float noise
    params = {"weight": _sd(tm)["weight"]}
    jm = jflows.InvConvNear(8, n_split=4)
    with torch.no_grad():
        tz, tld = tm(_tch(x), _tch(mask))
    jz, jld = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(jz), tz.numpy().transpose(0, 2, 1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jld), tld.numpy(), rtol=1e-5)
    # reverse inverts forward
    jx, _ = jm.apply({"params": params}, jz, jnp.asarray(mask), reverse=True)
    np.testing.assert_allclose(np.asarray(jx), x * mask, rtol=1e-4, atol=1e-5)


def test_coupling_block_parity():
    x, mask = _io(c=8, seed=3)
    tm = tref.CouplingBlock(8, 16, kernel_size=3, dilation_rate=2, n_layers=3)
    _randomize(tm, 4)
    sd = {f"decoder.flows.2.{k}": v for k, v in _sd(tm).items()}
    sd.update({"decoder.flows.0.logs": np.zeros((1, 8, 1), np.float32),
               "decoder.flows.0.bias": np.zeros((1, 8, 1), np.float32),
               "decoder.flows.1.weight": np.eye(4, dtype=np.float32)})
    cfg = Config({"model": {"gin_channels": 0,
                            "encoder": {"n_layers": 0, "prenet": False, "mean_only": True},
                            "decoder": {"n_blocks": 1, "n_layers": 3}}})
    # reuse only the flow-decoder part of the importer
    from tools.import_torch_checkpoint import _flow_decoder
    params = _flow_decoder(sd, "decoder", 1, 3, gin=False)["coupling_0"]
    jm = jflows.CouplingBlock(8, 16, kernel_size=3, dilation_rate=2, n_layers=3)
    with torch.no_grad():
        tz, tld = tm(_tch(x), _tch(mask))
    jz, jld = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask),
                       train=False)
    np.testing.assert_allclose(np.asarray(jz), tz.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jld), tld.numpy(), rtol=1e-4, atol=1e-5)


def test_wn_conditioner_parity():
    x, mask = _io(c=16, seed=5)
    tm = tref.WN(16, kernel_size=3, dilation_rate=2, n_layers=3)
    _randomize(tm, 6)
    sd = _sd(tm)
    from tools.import_torch_checkpoint import _wn_conv
    params = {}
    for i in range(3):
        params[f"in_{i}"] = _wn_conv(sd, f"in_layers.{i}")
        params[f"res_skip_{i}"] = _wn_conv(sd, f"res_skip_layers.{i}")
    jm = jflows.WN(16, 3, 2, 3)
    with torch.no_grad():
        ty = tm(_tch(x), _tch(mask))
    jy = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(jy), ty.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# text-encoder submodules
# --------------------------------------------------------------------------
def test_windowed_relative_attention_parity():
    x, mask = _io(b=2, t=10, c=8, seed=7)
    tm = tref.AttentionBlock(8, 8, n_heads=2, window_size=3)
    _randomize(tm, 8)
    sd = _sd(tm)
    from tools.import_torch_checkpoint import _conv
    params = {name: _conv(sd, name) for name in ("conv_q", "conv_k", "conv_v", "conv_o")}
    params["emb_rel_k"] = sd["emb_rel_k"]
    params["emb_rel_v"] = sd["emb_rel_v"]
    jm = jattn.RelativeSelfAttention(8, 8, n_heads=2, window_size=3)
    attn_mask_t = (_tch(mask).unsqueeze(2) * _tch(mask).unsqueeze(-1))
    attn_mask_j = jnp.asarray(mask[:, None, :, 0][..., None] * mask[:, None, None, :, 0])
    with torch.no_grad():
        ty = tm(_tch(x), _tch(x), attn_mask_t)
    jy = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(x), attn_mask_j,
                  train=False)
    np.testing.assert_allclose(np.asarray(jy), ty.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


def test_duration_predictor_and_ffn_parity():
    x, mask = _io(c=8, seed=9)
    from tools.import_torch_checkpoint import _duration_predictor
    tdp = tref.DurationPredictor(8, 12, kernel_size=3, p_dropout=0.0)
    _randomize(tdp, 10)
    params = _duration_predictor({f"p.{k}": v for k, v in _sd(tdp).items()}, "p")
    jdp = jattn.DurationPredictor(12, 3, 0.0)
    with torch.no_grad():
        td = tdp(_tch(x), _tch(mask))
    jd = jdp.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(jd), td.numpy(), rtol=1e-4, atol=1e-5)

    tffn = tref.FeedForwardNetwork(8, 8, 24, kernel_size=3)
    _randomize(tffn, 11)
    from tools.import_torch_checkpoint import _conv
    sd = _sd(tffn)
    params = {"conv_1": _conv(sd, "conv_1"), "conv_2": _conv(sd, "conv_2")}
    jffn = jattn.FeedForwardNetwork(8, 24, 3)
    with torch.no_grad():
        ty = tffn(_tch(x), _tch(mask))
    jy = jffn.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(jy), ty.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# whole stacks through the checkpoint importer
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def glow_transplant():
    enc = tref.TextEncoder(n_vocab=20, out_channels=10, hidden_channels=8,
                           filter_channels=24, filter_channels_dp=12, n_heads=2,
                           n_layers=2, kernel_size=3, p_dropout=0.0, window_size=3,
                           mean_only=False, prenet=True)
    dec = tref.FlowSpecDecoder(in_channels=10, hidden_channels=16, kernel_size=3,
                               dilation_rate=1, n_blocks=2, n_layers=2, n_split=4,
                               n_sqz=2)
    _randomize(enc, 20, scale=0.1)
    _randomize(dec, 21, scale=0.1)
    # restore positive-determinant invertible-conv weights (randomizing them
    # can flip det<0, where torch.logdet is NaN by definition; real training
    # keeps det>0 from the QR init)
    gen = torch.Generator().manual_seed(22)
    with torch.no_grad():
        for f in dec.flows:
            if isinstance(f, tref.InvConvNear):
                w = torch.linalg.qr(torch.randn(4, 4, generator=gen))[0]
                if torch.det(w) < 0:
                    w[:, 0] = -w[:, 0]
                f.weight.copy_(w * 1.2)
    sd = {f"encoder.{k}": v for k, v in _sd(enc).items()}
    sd.update({f"decoder.{k}": v for k, v in _sd(dec).items()})
    cfg = Config({"model": {
        "gin_channels": 0,
        "encoder": {"n_layers": 2, "prenet": True, "mean_only": False},
        "decoder": {"n_blocks": 2, "n_layers": 2},
    }})
    variables = import_glow_tts(sd, cfg)
    return enc, dec, variables


def test_text_encoder_stack_parity(glow_transplant):
    enc, _, variables = glow_transplant
    jenc = TextEncoder(n_vocab=20, out_channels=10, hidden_channels=8,
                       filter_channels=24, filter_channels_dp=12, n_heads=2,
                       n_layers=2, kernel_size=3, p_dropout=0.0, window_size=3,
                       mean_only=False, prenet=True)
    rng = np.random.RandomState(22)
    tokens = rng.randint(0, 20, (2, 9)).astype(np.int32)
    lens = np.array([9, 6], np.int32)
    enc.eval()
    with torch.no_grad():
        tm, tlogs, tlogw, _ = enc(torch.from_numpy(tokens).long(),
                                  torch.from_numpy(lens).long())
    jm, jlogs, jlogw, _ = jenc.apply({"params": variables["params"]["encoder"]},
                                     jnp.asarray(tokens), jnp.asarray(lens),
                                     train=False)
    np.testing.assert_allclose(np.asarray(jm), tm.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jlogs), tlogs.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jlogw), tlogw.numpy(), rtol=1e-4, atol=2e-5)


def test_flow_decoder_stack_parity_and_roundtrip(glow_transplant):
    _, dec, variables = glow_transplant
    jdec = FlowSpecDecoder(in_channels=10, hidden_channels=16, kernel_size=3,
                           dilation_rate=1, n_blocks=2, n_layers=2, n_split=4,
                           n_sqz=2)
    rng = np.random.RandomState(23)
    spect = rng.randn(2, 12, 10).astype(np.float32)
    mask = np.ones((2, 12, 1), np.float32)
    mask[1, 8:] = 0.0
    spect = spect * mask
    dec.eval()
    with torch.no_grad():
        tz, tld = dec(_tch(spect), _tch(mask))
    jz, jld = jdec.apply({"params": variables["params"]["decoder"]},
                         jnp.asarray(spect), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(jz), tz.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jld), tld.numpy(), rtol=1e-4, atol=1e-4)
    # reverse(forward(x)) == x within the valid (squeeze-truncated) region
    jx, _ = jdec.apply({"params": variables["params"]["decoder"]},
                       jz, jnp.asarray(mask), reverse=True, train=False)
    np.testing.assert_allclose(np.asarray(jx), spect * mask, rtol=1e-3, atol=1e-4)
