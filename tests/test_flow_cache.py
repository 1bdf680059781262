"""Inference-time flow caching (reference store_inverse / remove_weight_norm).

The reference pre-computes flow inverses for generation
(reference models/glow_tts/modules.py:234-236, submodules.py:289-336
store_inverse) and folds weight norm (submodules.py:233-238
remove_weight_norm). The TPU-native equivalent is the ``flow_cache``
variable collection (models/glow_tts/flows.py:build_flow_cache): one apply
with ``mutable=["flow_cache"]`` collects every InvConvNear inverse and every
WNConv1d folded kernel; subsequent applies read the cache and the optimized
HLO contains no LU/triangular-solve at runtime. scripts/synthesize.py builds
it by default (--flow_cache 0 opts out).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_masters_thesis_tpu.models.glow_tts.encoder import FlowSpecDecoder
from speech_masters_thesis_tpu.models.glow_tts.flows import build_flow_cache


@pytest.fixture(scope="module")
def decoder_and_vars():
    model = FlowSpecDecoder(in_channels=8, hidden_channels=12, kernel_size=5,
                            dilation_rate=1, n_blocks=2, n_layers=2,
                            p_dropout=0.0, n_split=4, n_sqz=2)
    rng = jax.random.PRNGKey(0)
    spect = jnp.zeros((1, 16, 8), jnp.float32)
    mask = jnp.ones((1, 16, 1), jnp.float32)
    variables = model.init({"params": rng}, spect, mask, reverse=True, train=False)
    return model, variables, spect, mask


_INVERSE_OPS = ("triangular-solve", "triangular_solve", "getrf", "lu-decomposition")


def _optimized_hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def test_init_does_not_leak_flow_cache(decoder_and_vars):
    """A cache sown at init would ride along in TrainState.model_state and
    silently bypass the live params after updates — must never happen."""
    _, variables, _, _ = decoder_and_vars
    assert "flow_cache" not in variables


def test_flow_cache_removes_runtime_inverse(decoder_and_vars):
    model, variables, spect, mask = decoder_and_vars
    cached = build_flow_cache(model, variables, spect, mask,
                              reverse=True, train=False)
    assert "flow_cache" in cached
    # every invconv contributed an inverse; every WN conv a folded kernel
    flat = jax.tree_util.tree_flatten_with_path(cached["flow_cache"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert sum("weight_inv" in n for n in names) == 2  # n_blocks
    assert any("kernel" in n for n in names)

    def reverse_cached(spect, mask):
        z, _ = model.apply(cached, spect, mask, reverse=True, train=False)
        return z

    hlo = _optimized_hlo(reverse_cached, spect, mask)
    assert not any(op in hlo for op in _INVERSE_OPS), \
        "runtime inverse survived despite flow_cache"


def test_without_cache_inverse_runs_at_runtime(decoder_and_vars):
    """Control: proves the HLO assertion above detects real elimination."""
    model, variables, spect, mask = decoder_and_vars

    def reverse_plain(variables, spect, mask):
        z, _ = model.apply(variables, spect, mask, reverse=True, train=False)
        return z

    hlo = _optimized_hlo(reverse_plain, variables, spect, mask)
    assert any(op in hlo for op in _INVERSE_OPS)


def test_cached_reverse_matches_uncached(decoder_and_vars):
    model, variables, spect, mask = decoder_and_vars
    cached = build_flow_cache(model, variables, spect, mask,
                              reverse=True, train=False)
    rng = np.random.RandomState(0)
    z_in = jnp.asarray(rng.randn(1, 16, 8).astype(np.float32))
    plain = model.apply(variables, z_in, mask, reverse=True, train=False)[0]
    with_cache = model.apply(cached, z_in, mask, reverse=True, train=False)[0]
    np.testing.assert_allclose(np.asarray(with_cache), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)
    # forward (training direction) is also identical under the cache: the
    # WN folded kernels are the exact same computation
    fwd_plain, ld_p = model.apply(variables, z_in, mask, reverse=False, train=False)
    fwd_cache, ld_c = model.apply(cached, z_in, mask, reverse=False, train=False)
    np.testing.assert_allclose(np.asarray(fwd_cache), np.asarray(fwd_plain),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_c), np.asarray(ld_p),
                               rtol=1e-6, atol=1e-6)
