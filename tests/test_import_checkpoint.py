"""Reference-checkpoint importer tests.

Roundtrip validation: freshly initialized model params -> export to the
reference's torch state_dict layout (keys + weight conventions) -> import
back -> exact equality. Validates the key mapping, the Conv/ConvTranspose/
Linear transposes, and structural completeness in both directions.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tools.import_torch_checkpoint import (
    export_transformer_lm,
    export_vqvae,
    import_transformer_lm,
    import_vqvae,
)
from speech_masters_thesis_tpu.models.transformer_lm.model import TransformerLM
from speech_masters_thesis_tpu.models.vqvae.model import VQVAE
from speech_masters_thesis_tpu.utils.config import Config

VQ_CONFIG = Config({
    "model": {
        "levels": 3, "downs_t": [3, 2, 2], "strides_t": [2, 2, 2], "emb_width": 16,
        "l_bins": 32, "mu": 0.99, "multipliers": [2, 1, 1], "width": 8, "depth": 2,
        "m_conv": 1.0, "revival_threshold": 1.0, "use_bottleneck": True,
        "dilation_growth_rate": 3, "dilation_cycle": None, "kernel_size_growth_rate": 2,
        "kernel_size_cycle": None, "reverse_decoder_dilation": True, "zero_out": True,
        "block_type": "gated_hifi",
        "loss": {"commit": 0.05, "multispectral": 1.0, "l1": 0.0, "l2": 1.0,
                 "linf": 0.02, "linf_topk": 64, "n_ffts": [512], "hop_lengths": [128],
                 "win_lengths": [512], "window": "hann", "log": True},
    }
})

LM_CONFIG = Config({
    "model": {
        "vocab_size": 24, "embed_dim": 16, "max_len": 64, "num_layers": 2,
        "d_model": 16, "nhead": 2, "dim_feedforward": 32, "dropout": 0.0,
        "activation": "relu", "layer_norm_eps": 1e-5, "norm_first": False,
        "loss_type": "ce",
    }
})


def _trees_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _trees_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"{path}/{k}")


def test_vqvae_state_dict_roundtrip():
    model = VQVAE(config=VQ_CONFIG.to_dict())
    rng = jax.random.PRNGKey(0)
    audio = jnp.zeros((1, 1024))
    variables = model.init({"params": rng, "dropout": rng, "codebook": rng},
                           audio, jnp.full((1,), 1024), train=False)
    variables = jax.device_get(dict(variables))

    sd = export_vqvae(variables, VQ_CONFIG)
    # reference layout invariants
    assert "encoders.0.level_blocks.0.blocks.0.weight" in sd
    assert "decoders.0.out.weight" in sd
    assert sd["decoders.0.out.weight"].shape == (1, 16, 1)  # [out, in, k]
    assert "bottleneck.level_blocks.0.k" in sd

    back = import_vqvae(sd, VQ_CONFIG)
    _trees_equal(variables["params"], back["params"])
    np.testing.assert_array_equal(
        np.asarray(variables["codebook"]["bottleneck"]["level_0"]["k"]),
        back["codebook"]["bottleneck"]["level_0"]["k"])


def test_lm_state_dict_roundtrip():
    model = TransformerLM(config=LM_CONFIG.to_dict())
    rng = jax.random.PRNGKey(1)
    tokens = jnp.zeros((1, 8), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, tokens,
                           jnp.full((1,), 8), train=False)
    variables = jax.device_get(dict(variables))

    sd = export_transformer_lm(variables, LM_CONFIG)
    assert sd["embedding.weight"].shape == (24 + 2, 16)
    assert sd["transformer.layers.0.self_attn.in_proj_weight"].shape == (48, 16)
    assert sd["classifier.weight"].shape == (24, 16)  # torch [out, in]

    back = import_transformer_lm(sd, LM_CONFIG)
    _trees_equal(variables["params"], back["params"])
