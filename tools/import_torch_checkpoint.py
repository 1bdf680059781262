"""Imports a reference (PyTorch) checkpoint into this framework's format.

The BASELINE north star — VQ code indices bitwise-matching a reference
checkpoint — needs the reference's trained weights inside this framework.
This tool maps a reference ``torch.save`` checkpoint
(``{"config", "model", "optim", ...}``, reference utils/train_utils.py:148-171)
onto our flax param/codebook trees:

  * VQ-VAE: encoders/decoders (level_blocks of strided convs + gated_hifi
    blocks, reference models/vqvae/{encdec,conv,resnet}.py) and the EMA
    codebook buffers (k, k_sum, k_elem — reference bottleneck.py:20-24)
  * TransformerLM: embedding, sinusoidal PE (recomputed), packed-qkv
    encoder layers, final norm, classifier (reference transformer_lm.py)
  * GlowTTS: TextEncoder (prenet, windowed relative attention, LayerNorm
    gamma/beta, duration predictor) and FlowSpecDecoder (ActNorm logs/bias,
    InvConvNear weight, CouplingBlock with weight_norm v/g convs) —
    reference models/glow_tts/modules.py:9-236, submodules.py:167-637
  * VQTTS: audio codec (as VQ-VAE), text encoder (as GlowTTS), grouped
    bottleneck k, quant_decoder ResNet, quant_proj — reference
    models/vqtts/vqtts.py:20-88

Conventions translated:
  torch Conv1d weight [out, in, k]      -> flax Conv kernel [k, in, out]
  torch ConvTranspose1d [in, out, k]    -> ConvTranspose1d kernel [k, out, in]
  torch Linear weight [out, in]         -> flax Dense kernel [in, out]

Usage:
    python -m tools.import_torch_checkpoint --ckpt ref_ckpt.pt --model vqvae \
        --out ./logs/vqvae_imported   # writes an orbax ckpt + config.yaml
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def _conv(sd: Dict[str, np.ndarray], name: str) -> dict:
    """torch Conv1d -> flax nn.Conv params."""
    w = sd[f"{name}.weight"]  # [out, in, k]
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv_transpose(sd: Dict[str, np.ndarray], name: str) -> dict:
    """torch ConvTranspose1d -> our ConvTranspose1d params (kernel [k, out, in])."""
    w = sd[f"{name}.weight"]  # [in, out, k]
    return {"kernel": np.transpose(w, (2, 1, 0)), "bias": sd[f"{name}.bias"]}


def _dense(sd: Dict[str, np.ndarray], name: str) -> dict:
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _res_layer(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    """Reference ResLayer: Sequential(Dropout, ReLU, Conv1d, Dropout, ReLU, Conv1d)
    -> our ResLayer {Conv_0, Conv_1} (reference resnet.py:16-36)."""
    return {
        "Conv_0": _conv(sd, f"{prefix}.model.2"),
        "Conv_1": _conv(sd, f"{prefix}.model.5"),
    }


def _gated_hifi(sd: Dict[str, np.ndarray], prefix: str, depth: int) -> dict:
    """Reference GatedHiFiBlock: blocks.N = Sequential(Conv1d, ResLayer), gate
    (resnet.py:184-241) -> our GatedHiFiBlock."""
    out = {}
    for d in range(depth):
        out[f"branch_in_{d}"] = _conv(sd, f"{prefix}.blocks.{d}.0")
        out[f"branch_res_{d}"] = _res_layer(sd, f"{prefix}.blocks.{d}.1")
    out["gate"] = _conv(sd, f"{prefix}.gate")
    return out


def _codec_level(sd: Dict[str, np.ndarray], prefix: str, down_t: int, depth: int,
                 decoder: bool) -> dict:
    """Reference Encoder/DecoderConvBlock 'blocks' ModuleList -> our named tree.

    Encoder layout (conv.py:62-78): [conv, block] * down_t + [out conv]
    Decoder layout (conv.py:111-137): [in conv] + [block, convT] * down_t
    """
    out = {}
    if not decoder:
        for i in range(down_t):
            out[f"MaskedConv1d_{i}"] = {"Conv_0": _conv(sd, f"{prefix}.blocks.{2 * i}")}
            out[f"GatedHiFiBlock_{i}"] = _gated_hifi(sd, f"{prefix}.blocks.{2 * i + 1}", depth)
        out[f"MaskedConv1d_{down_t}"] = {"Conv_0": _conv(sd, f"{prefix}.blocks.{2 * down_t}")}
    else:
        out["MaskedConv1d_0"] = {"Conv_0": _conv(sd, f"{prefix}.blocks.0")}
        for i in range(down_t):
            out[f"GatedHiFiBlock_{i}"] = _gated_hifi(sd, f"{prefix}.blocks.{2 * i + 1}", depth)
            out[f"MaskedConvTranspose1d_{i}"] = {
                "ConvTranspose1d_0": _conv_transpose(sd, f"{prefix}.blocks.{2 * i + 2}")}
    return out


def import_vqvae(state_dict: Dict[str, np.ndarray], config) -> dict:
    """Reference VQVAE state_dict -> {params, codebook} for our VQVAE.

    The reference keeps only its last level (vqvae.py:65-71); its module
    paths are encoders.0/decoders.0 over levels 0..L-1 internally.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    cfg = config.model
    depth = cfg.depth * (cfg.multipliers or [1] * cfg.levels)[-1]

    encoder = {}
    decoder = {}
    for level, down_t in enumerate(cfg.downs_t):
        encoder[f"level_{level}"] = _codec_level(
            sd, f"encoders.0.level_blocks.{level}", down_t, depth, decoder=False)
        decoder[f"level_{level}"] = _codec_level(
            sd, f"decoders.0.level_blocks.{level}", down_t, depth, decoder=True)
    decoder["out"] = _conv(sd, "decoders.0.out")

    params = {"encoder": encoder, "decoder": decoder}
    codebook = {"bottleneck": {"level_0": {
        "k": sd["bottleneck.level_blocks.0.k"].astype(np.float32),
        # k_sum/k_elem are not registered buffers in the reference (only k is,
        # bottleneck.py:24); restore_k semantics re-derive them from k
        "k_sum": sd["bottleneck.level_blocks.0.k"].astype(np.float32),
        "k_elem": np.ones(cfg.l_bins, np.float32),
        "initialized": np.ones((), np.bool_),
    }}}
    return {"params": params, "codebook": codebook}


def import_transformer_lm(state_dict: Dict[str, np.ndarray], config) -> dict:
    """Reference TransformerLM state_dict -> params for our TransformerLM."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    cfg = config.model
    params = {
        "embedding": {"embedding": sd["embedding.weight"]},
        "classifier": _dense(sd, "classifier"),
        "final_norm": {"scale": sd["transformer.norm.weight"],
                       "bias": sd["transformer.norm.bias"]},
    }
    for i in range(cfg.num_layers):
        p = f"transformer.layers.{i}"
        params[f"layer_{i}"] = {
            "self_attn": {
                "in_proj": {"kernel": sd[f"{p}.self_attn.in_proj_weight"].T,
                            "bias": sd[f"{p}.self_attn.in_proj_bias"]},
                "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
            },
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": {"scale": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]},
            "norm2": {"scale": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]},
        }
    return {"params": params}


# -- Glow-TTS / VQ-TTS ------------------------------------------------------
def _wn_conv(sd: Dict[str, np.ndarray], name: str) -> dict:
    """torch legacy weight_norm Conv1d (weight_g [out,1,1], weight_v [out,in,k])
    -> our WNConv1d params {v [k,in,out], g [out], bias}."""
    return {
        "v": np.transpose(sd[f"{name}.weight_v"], (2, 1, 0)),
        "g": sd[f"{name}.weight_g"].reshape(-1),
        "bias": sd[f"{name}.bias"],
    }


def _channel_layernorm(sd: Dict[str, np.ndarray], name: str) -> dict:
    """Reference channel-first LayerNorm {gamma, beta} -> flax LayerNorm."""
    return {"LayerNorm_0": {"scale": sd[f"{name}.gamma"], "bias": sd[f"{name}.beta"]}}


def _duration_predictor(sd: Dict[str, np.ndarray], p: str) -> dict:
    return {
        "conv_1": _conv(sd, f"{p}.conv_1"),
        "norm_1": _channel_layernorm(sd, f"{p}.norm_1"),
        "conv_2": _conv(sd, f"{p}.conv_2"),
        "norm_2": _channel_layernorm(sd, f"{p}.norm_2"),
        "proj": _conv(sd, f"{p}.proj"),
    }


def _text_encoder(sd: Dict[str, np.ndarray], prefix: str, n_layers: int,
                  prenet: bool, mean_only: bool) -> dict:
    """Reference TextEncoder (modules.py:9-131) -> our TextEncoder tree."""
    enc: dict = {"emb": {"embedding": sd[f"{prefix}.emb.weight"]}}
    if prenet:
        pre = {"proj": _conv(sd, f"{prefix}.pre.proj")}
        for i in range(3):
            pre[f"conv_{i}"] = _conv(sd, f"{prefix}.pre.conv_layers.{i}")
            pre[f"norm_{i}"] = _channel_layernorm(sd, f"{prefix}.pre.norm_layers.{i}")
        enc["pre"] = pre
    for i in range(n_layers):
        attn = {name: _conv(sd, f"{prefix}.attn_layers.{i}.{name}")
                for name in ("conv_q", "conv_k", "conv_v", "conv_o")}
        for rel in ("emb_rel_k", "emb_rel_v"):
            key = f"{prefix}.attn_layers.{i}.{rel}"
            if key in sd:
                attn[rel] = sd[key]
        enc[f"attn_{i}"] = attn
        enc[f"norm1_{i}"] = _channel_layernorm(sd, f"{prefix}.norm_layers_1.{i}")
        enc[f"ffn_{i}"] = {"conv_1": _conv(sd, f"{prefix}.ffn_layers.{i}.conv_1"),
                           "conv_2": _conv(sd, f"{prefix}.ffn_layers.{i}.conv_2")}
        enc[f"norm2_{i}"] = _channel_layernorm(sd, f"{prefix}.norm_layers_2.{i}")
    enc["proj_m"] = _conv(sd, f"{prefix}.proj_m")
    if not mean_only:
        enc["proj_s"] = _conv(sd, f"{prefix}.proj_s")
    enc["proj_w"] = _duration_predictor(sd, f"{prefix}.proj_w")
    return enc


def _flow_decoder(sd: Dict[str, np.ndarray], prefix: str, n_blocks: int,
                  wn_layers: int, gin: bool) -> dict:
    """Reference FlowSpecDecoder flows ModuleList -> our named flow tree.

    flows.{3b} ActNorm (logs/bias [1,C,1] -> [C]), flows.{3b+1} InvConvNear,
    flows.{3b+2} CouplingBlock (weight_norm start + WN + plain end).
    """
    dec: dict = {}
    for b in range(n_blocks):
        f = 3 * b
        dec[f"actnorm_{b}"] = {"logs": sd[f"{prefix}.flows.{f}.logs"].reshape(-1),
                               "bias": sd[f"{prefix}.flows.{f}.bias"].reshape(-1)}
        dec[f"invconv_{b}"] = {"weight": sd[f"{prefix}.flows.{f + 1}.weight"]}
        cpl = f"{prefix}.flows.{f + 2}"
        wn: dict = {}
        for i in range(wn_layers):
            wn[f"in_{i}"] = _wn_conv(sd, f"{cpl}.wn.in_layers.{i}")
            wn[f"res_skip_{i}"] = _wn_conv(sd, f"{cpl}.wn.res_skip_layers.{i}")
        if gin and f"{cpl}.wn.cond_layer.weight_v" in sd:
            wn["cond_layer"] = _wn_conv(sd, f"{cpl}.wn.cond_layer")
        dec[f"coupling_{b}"] = {"start": _wn_conv(sd, f"{cpl}.start"),
                                "wn": wn,
                                "end": _conv(sd, f"{cpl}.end")}
    return dec


def import_glow_tts(state_dict: Dict[str, np.ndarray], config) -> dict:
    """Reference GlowTTS state_dict (glow_tts.py:14-57 layout) -> our params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_cfg = config.model.encoder
    dec_cfg = config.model.decoder
    params = {
        "encoder": _text_encoder(sd, "encoder", enc_cfg.n_layers,
                                 enc_cfg.prenet, enc_cfg.mean_only),
        "decoder": _flow_decoder(sd, "decoder", dec_cfg.n_blocks,
                                 dec_cfg.n_layers, config.model.gin_channels > 0),
    }
    if "emb_g.weight" in sd:
        params["emb_g"] = {"embedding": sd["emb_g.weight"]}
    return {"params": params}


def import_vqtts(state_dict: Dict[str, np.ndarray], config) -> dict:
    """Reference VQTTS state_dict (vqtts.py:20-88 layout) -> our
    {params, codebook} trees (grouped bottleneck k: [n_vocab*l_bins, C])."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    cfg = config.model
    depth = cfg.depth * (cfg.multipliers or [1] * cfg.levels)[-1]

    audio_encoder, audio_decoder = {}, {}
    for level, down_t in enumerate(cfg.downs_t):
        audio_encoder[f"level_{level}"] = _codec_level(
            sd, f"audio_encoder.level_blocks.{level}", down_t, depth, decoder=False)
        audio_decoder[f"level_{level}"] = _codec_level(
            sd, f"audio_decoder.level_blocks.{level}", down_t, depth, decoder=True)
    audio_decoder["out"] = _conv(sd, "audio_decoder.out")

    enc_cfg = cfg.encoder
    params = {
        "audio_encoder": audio_encoder,
        "audio_decoder": audio_decoder,
        "text_encoder": _text_encoder(sd, "text_encoder", enc_cfg.n_layers,
                                      enc_cfg.prenet, enc_cfg.mean_only),
        "quant_decoder": {f"ResLayer_{i}": _res_layer(sd, f"quant_decoder.model.{i}")
                          for i in range(4)},
        "quant_proj": _conv(sd, "quant_proj"),
    }
    if "emb_g.weight" in sd:
        params["emb_g"] = {"embedding": sd["emb_g.weight"]}
    k = sd["quant_bottleneck.k"].astype(np.float32)
    codebook = {"quant_bottleneck": {
        "k": k, "k_sum": k.copy(),
        "k_elem": np.ones(k.shape[0], np.float32),
        "initialized": np.ones((), np.bool_),
    }}
    return {"params": params, "codebook": codebook}


# -- inverse direction: export our params to the reference's torch layout ----
def _inv_conv(tree: dict, name: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{name}.weight"] = np.transpose(np.asarray(tree["kernel"]), (2, 1, 0))
    if "bias" in tree:
        out[f"{name}.bias"] = np.asarray(tree["bias"])


def _inv_conv_transpose(tree: dict, name: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{name}.weight"] = np.transpose(np.asarray(tree["kernel"]), (2, 1, 0))
    out[f"{name}.bias"] = np.asarray(tree["bias"])


def _inv_res_layer(tree: dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
    _inv_conv(tree["Conv_0"], f"{prefix}.model.2", out)
    _inv_conv(tree["Conv_1"], f"{prefix}.model.5", out)


def _inv_gated_hifi(tree: dict, prefix: str, depth: int, out: Dict[str, np.ndarray]) -> None:
    for d in range(depth):
        _inv_conv(tree[f"branch_in_{d}"], f"{prefix}.blocks.{d}.0", out)
        _inv_res_layer(tree[f"branch_res_{d}"], f"{prefix}.blocks.{d}.1", out)
    _inv_conv(tree["gate"], f"{prefix}.gate", out)


def export_vqvae(variables: dict, config) -> Dict[str, np.ndarray]:
    """Our VQVAE {params, codebook} -> reference torch state_dict layout."""
    cfg = config.model
    depth = cfg.depth * (cfg.multipliers or [1] * cfg.levels)[-1]
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    for level, down_t in enumerate(cfg.downs_t):
        enc = params["encoder"][f"level_{level}"]
        p = f"encoders.0.level_blocks.{level}"
        for i in range(down_t):
            _inv_conv(enc[f"MaskedConv1d_{i}"]["Conv_0"], f"{p}.blocks.{2 * i}", sd)
            _inv_gated_hifi(enc[f"GatedHiFiBlock_{i}"], f"{p}.blocks.{2 * i + 1}", depth, sd)
        _inv_conv(enc[f"MaskedConv1d_{down_t}"]["Conv_0"], f"{p}.blocks.{2 * down_t}", sd)

        dec = params["decoder"][f"level_{level}"]
        p = f"decoders.0.level_blocks.{level}"
        _inv_conv(dec["MaskedConv1d_0"]["Conv_0"], f"{p}.blocks.0", sd)
        for i in range(down_t):
            _inv_gated_hifi(dec[f"GatedHiFiBlock_{i}"], f"{p}.blocks.{2 * i + 1}", depth, sd)
            _inv_conv_transpose(dec[f"MaskedConvTranspose1d_{i}"]["ConvTranspose1d_0"],
                                f"{p}.blocks.{2 * i + 2}", sd)
    _inv_conv(params["decoder"]["out"], "decoders.0.out", sd)
    sd["bottleneck.level_blocks.0.k"] = np.asarray(
        variables["codebook"]["bottleneck"]["level_0"]["k"])
    return sd


def _inv_wn_conv(tree: dict, name: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{name}.weight_v"] = np.transpose(np.asarray(tree["v"]), (2, 1, 0))
    out[f"{name}.weight_g"] = np.asarray(tree["g"]).reshape(-1, 1, 1)
    out[f"{name}.bias"] = np.asarray(tree["bias"])


def _inv_channel_layernorm(tree: dict, name: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{name}.gamma"] = np.asarray(tree["LayerNorm_0"]["scale"])
    out[f"{name}.beta"] = np.asarray(tree["LayerNorm_0"]["bias"])


def _inv_text_encoder(enc: dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.emb.weight"] = np.asarray(enc["emb"]["embedding"])
    if "pre" in enc:
        _inv_conv(enc["pre"]["proj"], f"{prefix}.pre.proj", out)
        for i in range(3):
            _inv_conv(enc["pre"][f"conv_{i}"], f"{prefix}.pre.conv_layers.{i}", out)
            _inv_channel_layernorm(enc["pre"][f"norm_{i}"],
                                   f"{prefix}.pre.norm_layers.{i}", out)
    i = 0
    while f"attn_{i}" in enc:
        attn = enc[f"attn_{i}"]
        for name in ("conv_q", "conv_k", "conv_v", "conv_o"):
            _inv_conv(attn[name], f"{prefix}.attn_layers.{i}.{name}", out)
        for rel in ("emb_rel_k", "emb_rel_v"):
            if rel in attn:
                out[f"{prefix}.attn_layers.{i}.{rel}"] = np.asarray(attn[rel])
        _inv_channel_layernorm(enc[f"norm1_{i}"], f"{prefix}.norm_layers_1.{i}", out)
        _inv_conv(enc[f"ffn_{i}"]["conv_1"], f"{prefix}.ffn_layers.{i}.conv_1", out)
        _inv_conv(enc[f"ffn_{i}"]["conv_2"], f"{prefix}.ffn_layers.{i}.conv_2", out)
        _inv_channel_layernorm(enc[f"norm2_{i}"], f"{prefix}.norm_layers_2.{i}", out)
        i += 1
    _inv_conv(enc["proj_m"], f"{prefix}.proj_m", out)
    if "proj_s" in enc:
        _inv_conv(enc["proj_s"], f"{prefix}.proj_s", out)
    dp = enc["proj_w"]
    _inv_conv(dp["conv_1"], f"{prefix}.proj_w.conv_1", out)
    _inv_channel_layernorm(dp["norm_1"], f"{prefix}.proj_w.norm_1", out)
    _inv_conv(dp["conv_2"], f"{prefix}.proj_w.conv_2", out)
    _inv_channel_layernorm(dp["norm_2"], f"{prefix}.proj_w.norm_2", out)
    _inv_conv(dp["proj"], f"{prefix}.proj_w.proj", out)


def _inv_flow_decoder(dec: dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
    b = 0
    while f"actnorm_{b}" in dec:
        f = 3 * b
        out[f"{prefix}.flows.{f}.logs"] = np.asarray(dec[f"actnorm_{b}"]["logs"]).reshape(1, -1, 1)
        out[f"{prefix}.flows.{f}.bias"] = np.asarray(dec[f"actnorm_{b}"]["bias"]).reshape(1, -1, 1)
        out[f"{prefix}.flows.{f + 1}.weight"] = np.asarray(dec[f"invconv_{b}"]["weight"])
        cpl = dec[f"coupling_{b}"]
        _inv_wn_conv(cpl["start"], f"{prefix}.flows.{f + 2}.start", out)
        i = 0
        while f"in_{i}" in cpl["wn"]:
            _inv_wn_conv(cpl["wn"][f"in_{i}"], f"{prefix}.flows.{f + 2}.wn.in_layers.{i}", out)
            _inv_wn_conv(cpl["wn"][f"res_skip_{i}"],
                         f"{prefix}.flows.{f + 2}.wn.res_skip_layers.{i}", out)
            i += 1
        if "cond_layer" in cpl["wn"]:
            _inv_wn_conv(cpl["wn"]["cond_layer"], f"{prefix}.flows.{f + 2}.wn.cond_layer", out)
        _inv_conv(cpl["end"], f"{prefix}.flows.{f + 2}.end", out)
        b += 1


def export_glow_tts(variables: dict, config) -> Dict[str, np.ndarray]:
    """Our GlowTTS params -> reference torch state_dict layout."""
    del config
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    _inv_text_encoder(params["encoder"], "encoder", sd)
    _inv_flow_decoder(params["decoder"], "decoder", sd)
    if "emb_g" in params:
        sd["emb_g.weight"] = np.asarray(params["emb_g"]["embedding"])
    return sd


def export_vqtts(variables: dict, config) -> Dict[str, np.ndarray]:
    """Our VQTTS {params, codebook} -> reference torch state_dict layout."""
    cfg = config.model
    depth = cfg.depth * (cfg.multipliers or [1] * cfg.levels)[-1]
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    for level, down_t in enumerate(cfg.downs_t):
        enc = params["audio_encoder"][f"level_{level}"]
        p = f"audio_encoder.level_blocks.{level}"
        for i in range(down_t):
            _inv_conv(enc[f"MaskedConv1d_{i}"]["Conv_0"], f"{p}.blocks.{2 * i}", sd)
            _inv_gated_hifi(enc[f"GatedHiFiBlock_{i}"], f"{p}.blocks.{2 * i + 1}", depth, sd)
        _inv_conv(enc[f"MaskedConv1d_{down_t}"]["Conv_0"], f"{p}.blocks.{2 * down_t}", sd)
        dec = params["audio_decoder"][f"level_{level}"]
        p = f"audio_decoder.level_blocks.{level}"
        _inv_conv(dec["MaskedConv1d_0"]["Conv_0"], f"{p}.blocks.0", sd)
        for i in range(down_t):
            _inv_gated_hifi(dec[f"GatedHiFiBlock_{i}"], f"{p}.blocks.{2 * i + 1}", depth, sd)
            _inv_conv_transpose(dec[f"MaskedConvTranspose1d_{i}"]["ConvTranspose1d_0"],
                                f"{p}.blocks.{2 * i + 2}", sd)
    _inv_conv(params["audio_decoder"]["out"], "audio_decoder.out", sd)
    _inv_text_encoder(params["text_encoder"], "text_encoder", sd)
    for i in range(4):
        _inv_res_layer(params["quant_decoder"][f"ResLayer_{i}"], f"quant_decoder.model.{i}", sd)
    _inv_conv(params["quant_proj"], "quant_proj", sd)
    if "emb_g" in params:
        sd["emb_g.weight"] = np.asarray(params["emb_g"]["embedding"])
    sd["quant_bottleneck.k"] = np.asarray(variables["codebook"]["quant_bottleneck"]["k"])
    return sd


def export_transformer_lm(variables: dict, config) -> Dict[str, np.ndarray]:
    """Our TransformerLM params -> reference torch state_dict layout."""
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {
        "embedding.weight": np.asarray(params["embedding"]["embedding"]),
        "classifier.weight": np.asarray(params["classifier"]["kernel"]).T,
        "classifier.bias": np.asarray(params["classifier"]["bias"]),
        "transformer.norm.weight": np.asarray(params["final_norm"]["scale"]),
        "transformer.norm.bias": np.asarray(params["final_norm"]["bias"]),
    }
    for i in range(config.model.num_layers):
        layer = params[f"layer_{i}"]
        p = f"transformer.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = np.asarray(layer["self_attn"]["in_proj"]["kernel"]).T
        sd[f"{p}.self_attn.in_proj_bias"] = np.asarray(layer["self_attn"]["in_proj"]["bias"])
        sd[f"{p}.self_attn.out_proj.weight"] = np.asarray(layer["self_attn"]["out_proj"]["kernel"]).T
        sd[f"{p}.self_attn.out_proj.bias"] = np.asarray(layer["self_attn"]["out_proj"]["bias"])
        for lin in ("linear1", "linear2"):
            sd[f"{p}.{lin}.weight"] = np.asarray(layer[lin]["kernel"]).T
            sd[f"{p}.{lin}.bias"] = np.asarray(layer[lin]["bias"])
        for norm in ("norm1", "norm2"):
            sd[f"{p}.{norm}.weight"] = np.asarray(layer[norm]["scale"])
            sd[f"{p}.{norm}.bias"] = np.asarray(layer[norm]["bias"])
    return sd


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, help="reference torch checkpoint (.pt)")
    parser.add_argument("--model", required=True,
                        choices=["vqvae", "transformer_lm", "glow_tts", "vqtts"])
    parser.add_argument("--config", required=True, help="model config yaml")
    parser.add_argument("--dataset_config", default=None)
    parser.add_argument("--out", required=True, help="output log_dir (ckpts/ + config.yaml)")
    args = parser.parse_args()

    import torch

    from speech_masters_thesis_tpu.utils.config import Config, load_config

    payload = torch.load(args.ckpt, map_location="cpu")
    state_dict = {k: v.numpy() for k, v in payload["model"].items()}
    config = load_config(args.config)
    if args.dataset_config:
        config = config.merge(load_config(args.dataset_config))

    importers = {"vqvae": import_vqvae, "transformer_lm": import_transformer_lm,
                 "glow_tts": import_glow_tts, "vqtts": import_vqtts}
    variables = importers[args.model](state_dict, config)

    # verify the mapped tree matches a freshly initialized model's structure
    import jax

    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    config_full = Config(config)
    config_full.setdefault("train", {"batch_size": 1, "seed": 0})
    model = get_model(config_full)
    reference_vars = init_model_variables(model, config_full, jax.random.PRNGKey(0))
    _check_tree(reference_vars["params"], variables["params"], "params")

    import os

    from speech_masters_thesis_tpu.train.checkpoint import save_checkpoint
    from speech_masters_thesis_tpu.train.optim import build_optimizer
    from speech_masters_thesis_tpu.train.state import TrainState

    os.makedirs(args.out, exist_ok=True)
    merged = dict(reference_vars)
    merged.update(variables)
    tx, _ = build_optimizer(config_full, None)
    state = TrainState.create(merged, tx, use_ema=False)
    config_full.train.log_dir = args.out
    config_full.train.total_epochs = 0
    save_checkpoint(config_full, int(payload.get("step", 0)), 0, state)
    config_full.save(os.path.join(args.out, "config.yaml"))
    print(f"Imported {args.model} checkpoint into {args.out}")


def _check_tree(expected, got, path):
    """Asserts the converted tree matches the model's structure and shapes."""
    if isinstance(expected, dict):
        missing = set(expected) - set(got)
        extra = set(got) - set(expected)
        assert not missing and not extra, f"{path}: missing={missing} extra={extra}"
        for k in expected:
            _check_tree(expected[k], got[k], f"{path}/{k}")
    else:
        assert tuple(expected.shape) == tuple(np.shape(got)), \
            f"{path}: shape {np.shape(got)} != expected {tuple(expected.shape)}"


if __name__ == "__main__":
    main()
