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
    parser.add_argument("--model", required=True, choices=["vqvae", "transformer_lm"])
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

    if args.model == "vqvae":
        variables = import_vqvae(state_dict, config)
    else:
        variables = import_transformer_lm(state_dict, config)

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
